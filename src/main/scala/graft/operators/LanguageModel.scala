package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the perplexity
  * quality filter of CCNet-style pipelines: train a bigram model on
  * the corpus itself (or a reference corpus), score every document by
  * its average negative log-likelihood, drop the tail.
  *
  * Model: add-one-smoothed bigram MLE,
  * `P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V)`, with `C(w1 ·)` the
  * count of bigram OCCURRENCES starting at `w1` and `V` the distinct
  * continuation vocabulary. All counts are exact integers, so the
  * per-bigram probability is the identical IEEE double in any engine;
  * only the per-doc average's fold order is engine-dependent (absorbed
  * by rounding, as with the tf-idf and entropy queries).
  *
  * Scale shape: ONE corpus pass builds the bigram occurrence table
  * (native multiset shingle kernel); the model is a grouped count of
  * that table, and `C(w1 ·)` re-aggregates the model — never the
  * corpus. Scoring joins occurrences to the model on the bigram key
  * (both sides hash-partitioned on it; the model is usually orders of
  * magnitude smaller than the corpus and broadcasts under AQE), then
  * one per-doc aggregate. The corpus text itself is read once and
  * never shuffled — only (doc_id, bigram) pairs move.
  */
object LanguageModel {

  /** Per-document average negative log2 likelihood under the corpus's
    * own add-one bigram model. Documents with no bigram (< 2 tokens)
    * are omitted.
    * @return (idCol, nll) with nll rounded to `scale` decimals. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      scale: Int = 6): DataFrame = {
    val bi = docs.select(col(idCol),
      explode(TextFunctions.shinglesAll(col(textCol), 2)).as("bg"))
    val bc = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
    val uc = bc.groupBy("w1").agg(sum("c2").as("c1"))
    val v = bc.select(countDistinct(col("w2"))).head.getLong(0)
    val model = bc.join(uc, "w1")
      .select(col("bg"),
        (-log2((col("c2") + 1) / (col("c1") + lit(v.toDouble)))).as("nl"))
    bi.join(model, "bg")
      .groupBy(idCol)
      .agg(round(avg(col("nl")), scale).as("nll"))
  }

  /** Pointwise mutual information collocation mining:
    * `pmi(a,b) = log2( P(a,b) / (P(a)·P(b)) )` with `P(a,b) = C(ab)/N`
    * over corpus bigram occurrences (N total) and `P(w) = C(w)/W` over
    * token occurrences (W total). High-PMI pairs co-occur far more
    * than their unigram frequencies predict — the classic collocation
    * / multiword-expression detector.
    *
    * All counts are exact integers and the pmi expression is a single
    * fixed-order double computation, so engines agree to the last ulp
    * of log2 — `scale` rounding absorbs that (bigramNll precedent).
    *
    * Scale shape: one corpus pass for bigrams, one for unigrams (both
    * narrow explodes + hash aggregates); the unigram table joins onto
    * the bigram table twice on the word key — vocabulary-sized inputs,
    * broadcast under AQE. N and W are scalar aggregates attached by
    * broadcast cross join. The corpus never shuffles.
    *
    * @param minCount  drop bigrams with C(ab) below this (PMI of rare
    *   pairs is noise — and the filter keeps the report vocabulary²-free)
    * @return (w1, w2, c_ab, pmi) */
  def pmi(docs: DataFrame, textCol: String, minCount: Long,
      scale: Int = 6): DataFrame = {
    // both count tables are persisted and the W/N scalars force them, so
    // the returned plan reads the caches (two corpus scans total); the
    // blocks release via ContextCleaner when the plan is collected —
    // same documented lifecycle as Dbscan.run's internal persists
    val uni = docs.select(
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).persist()
    // sum() over zero groups is NULL — an empty corpus (or one with no
    // bigram anywhere) must yield an empty result, not an NPE here; the
    // zero totals are never divided by (the count tables are empty, so
    // the per-row pmi expression never evaluates)
    def scalarSum(df: DataFrame): Long = {
      val v = df.head.get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }
    val w = scalarSum(uni.agg(sum("c")))
    val bc = docs.select(
        explode(TextFunctions.shinglesAll(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab")).persist()
    val n = scalarSum(bc.agg(sum("c_ab")))
    bc
      .filter(col("c_ab") >= minCount)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log2((col("c_ab").cast("double") / n) /
          ((col("c_a").cast("double") / w) *
            (col("c_b").cast("double") / w))), scale).as("pmi"))
  }

  /** Multinomial naive-Bayes classifier trained and evaluated on the
    * corpus itself (resubstitution): add-one token likelihoods per
    * class, log-space scoring, argmax prediction — reported as the
    * confusion matrix (label, pred, n). The supervised sibling of
    * [[bigramNll]]'s unsupervised quality score, and the classic
    * fastText-shaped language-ID / topic-gate baseline of training-data
    * pipelines (route/filter shards by a cheap count-based model before
    * anything expensive runs).
    *
    * Model: P(t|c) = (C(t,c)+1) / (C(·,c)+V) over token OCCURRENCES,
    * V = the corpus-wide distinct vocabulary; P(c) = docs(c)/N.
    * score(d,c) = log2 P(c) + Σ_t C(t,d)·log2 P(t|c). A token the
    * class never saw contributes the smoothing floor log2(1/(C(·,c)+V)).
    *
    * Numeric discipline (the DSIR λ-sum): every per-(class,token) log
    * is rounded to 9 decimals; per-doc terms C(t,d)·lp round again to
    * 9 and sum as decimal(38,9) — order-free, oracle-exact; the argmax
    * min(struct(−score, class)) breaks exact ties toward the smaller
    * class name.
    *
    * Scale shape: ONE tokenize pass builds the per-doc term counts
    * (persisted — the class-token model and the scoring both derive
    * from it; ContextCleaner releases it with the plan). The model and
    * the per-class floor/prior table are vocabulary×classes-sized —
    * broadcast onto the scoring join; the corpus text never shuffles.
    * Scoring fans each posting row out ×|classes| (the left join
    * against the model grid), collapsing in the same aggregate. When
    * the model fits under `modelThreshold` rows it is COLLECTED and
    * rebuilt driver-side as literal tables (the Bpe/IVF inlining
    * pattern — the distributed model DAG is ~10 orchestration-bound
    * Spark jobs for a table that is often a few hundred rows); the
    * driver arithmetic replicates round(log2(...), 9) exactly and a
    * spec pins both paths bit-equal.
    *
    * @param modelThreshold max vocab×classes rows for the driver-built
    *   model path (the distributed build handles any size)
    * @return (labelCol, pred, n) — rows only for observed
    *   (true, predicted) pairs */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, modelThreshold: Long = 1_000_000L): DataFrame = {
    val spark = docs.sparkSession
    // persisted: the model build and the scoring join both read the
    // per-doc term counts (released by ContextCleaner with the plan)
    val dt = docs
      .select(col(idCol).as("id"), col(labelCol).as("label"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy("id", "label", "t")
      .agg(count(lit(1)).as("c"))
      .persist()
    // doc counts per class off dt, not a second corpus scan: every doc
    // has >= 1 token (split("") = [""]), so no doc is lost
    val docCounts = dt.groupBy(col("label").as("cl"))
      .agg(countDistinct(col("id")).as("nd"))
    val classTok = dt.groupBy(col("label").as("cl"), col("t"))
      .agg(sum(col("c")).cast("long").as("ct"))
      .persist()
    val modelSize = classTok.count()
    // (model, per-class info) — driver-built literal tables when the
    // vocab×classes model is small (the Bpe/IVF inlining pattern: the
    // multi-stage model DAG costs ~10 Spark jobs of pure orchestration
    // at local scale); the distributed build is the identical
    // arithmetic expressed in Spark expressions (spec-pinned equal)
    val (modelDf, infoDf) =
      if (modelSize <= modelThreshold) {
        val ctok = classTok.collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val nds = docCounts.collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap
        val v = ctok.iterator.map(_._2).toSet.size
        val nTot = nds.values.sum
        val tot = ctok.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        def round9(x: Double): Double = BigDecimal(x)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        // Catalyst's Log2 evaluates StrictMath.log(x)/StrictMath.log(2)
        // — Math.log is an intrinsic that differs by 1 ulp on some
        // inputs, enough to flip a round(,9) half-case (spec-pinned)
        def lg2(x: Double): Double =
          StrictMath.log(x) / StrictMath.log(2.0)
        import spark.implicits._
        val m = ctok.toSeq.map { case (cl, t, ct) =>
          (cl, t, round9(lg2((ct + 1).toDouble / (tot(cl) + v).toDouble)))
        }.toDF("cl", "t", "lp")
        val i = nds.toSeq.map { case (cl, nd) =>
          (cl, round9(lg2(1.0 / (tot(cl) + v).toDouble)),
            round9(lg2(nd.toDouble / nTot.toDouble)))
        }.toDF("cl", "lp0", "lpr")
          .withColumn("lpr", round(col("lpr"), 9).cast("decimal(38,9)"))
        (m, i)
      } else {
        val vocab = classTok.agg(countDistinct(col("t")).as("v"))
        val classTot = classTok.groupBy("cl")
          .agg(sum(col("ct")).cast("long").as("tot"))
          .crossJoin(broadcast(vocab))
        val nTot = docCounts.agg(sum(col("nd")).as("n"))
        val m = classTok
          .join(classTot.select(col("cl"), col("tot"), col("v")), "cl")
          .select(col("cl"), col("t"),
            round(log2((col("ct") + 1).cast("double") /
              (col("tot") + col("v")).cast("double")), 9).as("lp"))
        val i = classTot
          .join(docCounts, "cl")
          .crossJoin(broadcast(nTot))
          .select(col("cl"),
            round(log2(lit(1.0) /
              (col("tot") + col("v")).cast("double")), 9).as("lp0"),
            round(log2(col("nd").cast("double") / col("n").cast("double")),
              9).cast("decimal(38,9)").as("lpr"))
        (m, i)
      }
    dt
      .crossJoin(broadcast(infoDf))
      .join(broadcast(modelDf), Seq("cl", "t"), "left")
      .groupBy("id", "label", "cl")
      .agg(sum(round(col("c").cast("double") *
          coalesce(col("lp"), col("lp0")), 9).cast("decimal(38,9)"))
        .as("s"),
        min(col("lpr")).as("lpr")) // constant within the group
      .select(col("id"), col("label"), col("cl"),
        (col("s") + col("lpr")).as("score"))
      .groupBy("id", "label")
      .agg(min(struct((-col("score")).as("ns"), col("cl"))).as("best"))
      .groupBy(col("label").as(labelCol), col("best.cl").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Good–Turing frequency-of-frequencies: N_r = number of distinct
    * words occurring exactly r times, for r ≤ maxR, with the classic
    * Good–Turing adjusted count r* = (r+1)·N_{r+1}/N_r (null where
    * N_{r+1} = 0) — the smoothing table behind Katz/GT-discounted LMs
    * and the standard vocabulary-growth diagnostic (N_1/N estimates the
    * unseen-mass).
    *
    * Shape: ONE token shuffle builds the vocabulary count table; N_r is
    * a second aggregate over the vocabulary (≪ tokens), and r* is a
    * self-join of that tiny table on r+1 — broadcast under AQE.
    * Numerics: r* = exact-integer ratio in one fixed-order double
    * expression, rounded.
    *
    * @param n n-gram order the table is computed over (1 = words; use a
    *   higher order when the word vocabulary has no low-count tail, as
    *   with small closed vocabularies).
    * @return (r, n_r, r_star) for every occupied r ≤ maxR. */
  def countOfCounts(docs: DataFrame, textCol: String, maxR: Int,
      n: Int = 1, scale: Int = 6): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    require(n >= 1, s"n must be >= 1, got $n")
    val units =
      if (n == 1)
        docs.select(
          explode(graft.functions.TextFunctions.tokens(col(textCol)))
            .as("w"))
      else
        docs.select(
          explode(graft.functions.TextFunctions
            .shinglesAll(col(textCol), n)).as("w"))
    val nr = units
      .groupBy("w").agg(count(lit(1)).as("c"))
      .groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    nr.filter(col("r") <= maxR)
      .join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .select(col("r"), col("n_r"),
        round((col("r") + 1).cast("double") * col("n_r1").cast("double")
          / col("n_r").cast("double"), scale).as("r_star"))
  }

  /** Per-document out-of-vocabulary rate under the corpus's own top-K
    * vocabulary — the tokenizer-coverage screen ("how much of each doc
    * would map to <unk>"), the fixed-vocab complement of the fertility
    * report (q146). Vocabulary = the K most frequent words, ties broken
    * by word ascending (deterministic in any engine).
    *
    * Shape: one tokenize pass (persisted — vocabulary, totals, and the
    * known-token semi-join all read it); the rank window runs over the
    * VOCABULARY table (words, not tokens) and the top-K set broadcasts.
    * At a 100 TB corpus swap the rank window for the bounded top-K
    * heap aggregate — the vocabulary table is the knob, not the rows.
    *
    * @return (doc_id, n_tokens, n_known, oov_rate). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabK: Int): DataFrame = {
    require(vocabK >= 1, s"vocabK must be >= 1, got $vocabK")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("w"))
      .persist() // three readers: vocab, totals, known-join
    val topv = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("w"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("w"))).as("r"))
      .filter(col("r") <= vocabK)
      .select("w")
    val totals = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val known = toks.join(broadcast(topv), Seq("w"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_in"))
    totals.join(known, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_in"), lit(0L)).as("n_known"))
      .withColumn("oov_rate",
        round((col("n_tokens") - col("n_known")).cast("double") /
          col("n_tokens").cast("double"), 6))
  }

  /** Stupid Backoff trigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — THE distributed n-gram
    * LM: no discounting, no normalization, built for MapReduce-scale
    * corpora). Trained on `train`, scored over `docs`:
    *
    *   S(w3|w1 w2) = c3(w1w2w3)/c2(w1w2)            trigram seen
    *               = α · c2(w2w3)/c1(w2)             else, bigram seen
    *               = α² · c1(w3)/N                   else, unigram seen
    *               = α² · 1/N                        else (OOV floor)
    *
    * Per-doc quality = mean log2 S over trigram positions (docs with
    * < 3 tokens are omitted). Train on a reference slice (CCNet style)
    * so held-out docs actually exercise the backoff chain.
    *
    * Shape: one pass over `train` builds the three count tables (the
    * token stream is re-read, never shuffled wide — each count is one
    * grouped aggregate); scoring LEFT-joins the corpus trigram stream
    * against them on their n-gram keys. Model tables are corpus-
    * vocabulary-sized — orders of magnitude below the token stream —
    * and broadcast under AQE; at web scale they hash-partition on the
    * n-gram key exactly like the paper's sharded LM serving.
    *
    * Numerics: every S is a ratio of exact longs times an IEEE-exact α
    * power — identical doubles in any engine; only the per-doc mean's
    * fold order is engine-dependent (absorbed by `round`, the q74
    * discipline).
    *
    * @return (idCol, n_trigrams, sb_score). */
  def stupidBackoff(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.4, scale: Int = 6): DataFrame = {
    import graft.functions.TextFunctions.{tokens, shinglesAll}
    val c1 = train.select(explode(tokens(col(textCol))).as("u_w"))
      .groupBy("u_w").agg(count(lit(1)).as("u_c"))
    val n = c1.agg(sum(col("u_c"))).head.getLong(0)
    require(n > 0, "train corpus has no tokens")
    val c2 = train.select(explode(shinglesAll(col(textCol), 2)).as("b_g"))
      .groupBy("b_g").agg(count(lit(1)).as("b_c"))
    val c3 = train.select(explode(shinglesAll(col(textCol), 3)).as("t_g"))
      .groupBy("t_g").agg(count(lit(1)).as("t_c"))
    val occ = docs.select(col(idCol),
        explode(shinglesAll(col(textCol), 3)).as("tg"))
      .withColumn("__ws", split(col("tg"), " "))
      .select(col(idCol), col("tg"),
        concat_ws(" ", element_at(col("__ws"), 1),
          element_at(col("__ws"), 2)).as("bg12"),
        concat_ws(" ", element_at(col("__ws"), 2),
          element_at(col("__ws"), 3)).as("bg23"),
        element_at(col("__ws"), 2).as("w2"),
        element_at(col("__ws"), 3).as("w3"))
    val joined = occ
      .join(c3, col("tg") === col("t_g"), "left")
      .join(c2.withColumnRenamed("b_c", "c2_12"),
        col("bg12") === col("b_g"), "left").drop("b_g")
      .join(c2.withColumnRenamed("b_g", "b_g2")
        .withColumnRenamed("b_c", "c2_23"),
        col("bg23") === col("b_g2"), "left")
      .join(c1.withColumnRenamed("u_c", "c1_2"),
        col("w2") === col("u_w"), "left").drop("u_w")
      .join(c1.withColumnRenamed("u_w", "u_w3")
        .withColumnRenamed("u_c", "c1_3"),
        col("w3") === col("u_w3"), "left")
    val s3 = col("t_c").cast("double") / col("c2_12").cast("double")
    val s2 = lit(alpha) *
      (col("c2_23").cast("double") / col("c1_2").cast("double"))
    val s1 = lit(alpha * alpha) *
      (coalesce(col("c1_3"), lit(1L)).cast("double") / lit(n.toDouble))
    joined
      .select(col(idCol), log2(
        when(col("t_c").isNotNull, s3)
          .when(col("c2_23").isNotNull, s2)
          .otherwise(s1)).as("__lg"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        round(avg(col("__lg")), scale).as("sb_score"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * Chen & Goodman 1998 interpolated form) — the standard smoothed
    * n-gram LM, complementing [[stupidBackoff]]'s unnormalized scores
    * with a true probability model:
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + (D · N1+(w1·)/c(w1·)) · Pcont(w2)       context seen
    *            = Pcont(w2)                                else
    *   Pcont(w2) = max(N1+(·w2), 1) / N1+(··)
    *
    * with discount D = 3/4 — dyadic, hence IEEE-exact, and inside the
    * Chen–Goodman optimal range for count-heavy corpora. All counts
    * derive from ONE bigram-type table: c(w1·) = Σ_w2 c(w1w2) (the
    * context total — sidesteps the end-of-document unigram mismatch),
    * N1+(w1·)/N1+(·w2) are its per-side row counts, N1+(··) its size.
    * The max(·,1) floor keeps never-seen continuations off log2(0)
    * (documented OOV floor, not textbook KN — textbook leaves OOV
    * undefined).
    *
    * Shape: the model is three grouped aggregates over the bigram-type
    * table (vocabulary-scale, broadcast under AQE); scoring LEFT-joins
    * the corpus bigram stream on its keys — the stream itself never
    * shuffles wide. N1+(··) is a collected scalar (one count of the
    * model table, the [[stupidBackoff]] `n` precedent).
    *
    * Numerics: every term is a ratio of exact longs and the dyadic D;
    * the two-term sum is written in ONE fixed order mirrored verbatim
    * in the oracle SQL; only the per-doc mean's fold order is
    * engine-dependent (absorbed by `round`, the q74 discipline).
    *
    * @return (idCol, n_bigrams, kn_score) — docs with < 2 tokens are
    *   omitted (no bigram positions to score). */
  def knBigram(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, scale: Int = 6): DataFrame = {
    import graft.functions.TextFunctions.shinglesAll
    val d = 0.75
    // bigram types with counts, split once into (w1, w2) — the single
    // source for every model table (persisted: four consumers)
    val types = train
      .select(explode(shinglesAll(col(textCol), 2)).as("b_g"))
      .groupBy("b_g").agg(count(lit(1)).as("c2"))
      .withColumn("__p", split(col("b_g"), " "))
      .select(col("b_g"), col("c2"),
        element_at(col("__p"), 1).as("w1"),
        element_at(col("__p"), 2).as("w2"))
      .persist()
    val nbb = types.count() // N1+(··): distinct bigram types
    require(nbb > 0, "train corpus has no bigrams")
    val ctx = types.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1ctx"), count(lit(1)).as("n1f"))
    val cont = types.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val occ = docs.select(col(idCol),
        explode(shinglesAll(col(textCol), 2)).as("bg"))
      .withColumn("__ws", split(col("bg"), " "))
      .select(col(idCol), col("bg"),
        element_at(col("__ws"), 1).as("qw1"),
        element_at(col("__ws"), 2).as("qw2"))
    val joined = occ
      .join(types.select(col("b_g"), col("c2")),
        col("bg") === col("b_g"), "left").drop("b_g")
      .join(ctx, col("qw1") === col("w1"), "left").drop("w1")
      .join(cont, col("qw2") === col("w2"), "left").drop("w2")
    // fixed-order arithmetic, mirrored verbatim in the oracle SQL
    val pcont = coalesce(col("n1b"), lit(1L)).cast("double") /
      lit(nbb.toDouble)
    val term1 = when(col("c2").isNotNull,
      (col("c2").cast("double") - lit(d)) / col("c1ctx").cast("double"))
      .otherwise(lit(0.0))
    val backoff = ((lit(d) * col("n1f").cast("double")) /
      col("c1ctx").cast("double")) * pcont
    val p = when(col("c1ctx").isNotNull, term1 + backoff).otherwise(pcont)
    joined
      .select(col(idCol), log2(p).as("__lg"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lg")), scale).as("kn_score"))
  }

  /** Per-document lexical-diversity profile — the vocabulary-richness
    * quality signals beside entropy (q52) and repetition (q51):
    * type–token ratio (distinct words / words) and the hapax share
    * (fraction of the document's vocabulary occurring exactly once).
    * Low TTR = loops/boilerplate; near-1 TTR with high hapax on long
    * docs = lexicon dumps — both standard corpus-filter axes.
    *
    * Shape: one tokenize pass into a (doc, word) count aggregate, one
    * per-doc rollup — the rollup's input is the per-doc vocabulary,
    * already far smaller than the token stream. Counts exact; the two
    * closing ratios divide once each, rounded.
    *
    * @return (doc_id, n_tokens, n_types, ttr, hapax_frac). */
  def lexicalDiversity(docs: DataFrame, idCol: String, textCol: String,
      scale: Int = 6): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("__hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), scale).as("ttr"),
        round(col("__hapax").cast("double") /
          col("n_types").cast("double"), scale).as("hapax_frac"))
}
