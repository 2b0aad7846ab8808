package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora — the standard
  * training-data pipeline family: exact (hash), exact n-gram Jaccard
  * similarity join, MinHash+LSH near-dup, SimHash near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash shuffle (groupBy fingerprint);
  *  - the Jaccard join is an inverted-index equi-join on shingles — never a
  *    cross join: cost is Σ_shingle df(shingle)², bounded by dropping
  *    ultra-frequent shingles (`maxDocFreq`) exactly like stopword pruning
  *    in ppjoin-family algorithms;
  *  - MinHash-LSH replaces the candidate step by band-bucket equi-joins
  *    (b × one shuffle each, unioned) and only exact-verifies candidates;
  *  - SimHash reduces each doc to one int64; near-dup = band equi-join on
  *    rotated fingerprints, Hamming-verified.
  *
  * ID contract: the similarity joins (`jaccardJoin`, `jaccardJoinPrefix`,
  * `minHashJoin`/`lshCandidates`) require `idCol` to be BIGINT — the
  * native posting-list pair kernels are monomorphic over long ids (that is
  * what makes them allocation-free). Cast other integral id types up
  * front; non-integral ids need a surrogate key.
  */
object Dedup {

  /** Exact dedup: keep the minimum id per identical text.
    * @return (`idCol`) — survivor ids. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Corpus-level segment dedup (the C4/RefinedWeb "line-level" pass):
    * split every document into fixed `segWords`-word segments, keep only
    * the globally FIRST occurrence of each distinct segment text (first =
    * min (id, segment index) — deterministic), and reassemble each
    * document from its surviving segments in order. Removes boilerplate
    * repeated across documents while keeping the rest of every document,
    * which doc-level dedup cannot do.
    *
    * Scale shape: explode is narrow; the global first-occurrence pick is
    * ONE hash aggregate on segment text (`min(struct(id, idx))` — no
    * window, no sort); survivors join back on the same segment key and
    * the per-doc reassembly is a second hash aggregate with an in-group
    * `array_sort` (bounded by a doc's own segment count). Documents whose
    * every segment was seen earlier disappear from the output — a fully
    * deduplicated doc has no text left.
    *
    * @return (`idCol`, text_dedup) for docs with ≥1 surviving segment. */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    require(segWords >= 1, s"segWords must be >= 1, got $segWords")
    // the segment table feeds both the first-occurrence aggregate and
    // the semi-join probe — persist it or the full-corpus explode (and
    // its upstream scan) runs twice (cache lifecycle: released by the
    // ContextCleaner with the plan, the jaccardJoin convention)
    val segs = docs.select(col(idCol).as("id"),
        posexplode(segments(col(textCol), segWords)).as(Seq("idx", "seg")))
      .persist()
    val firsts = segs.groupBy("seg")
      .agg(min(struct(col("id"), col("idx"))).as("first"))
      .select(col("seg"), col("first.id").as("id"),
        col("first.idx").as("idx"))
    segs.join(firsts, Seq("seg", "id", "idx"), "left_semi")
      .groupBy(col("id").as(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("seg")))),
        x => x.getField("seg")), " ").as("text_dedup"))
  }

  /** Consecutive `segWords`-word segments of a space-separated text (the
    * last, possibly shorter, remainder included). */
  private def segments(text: Column, segWords: Int): Column = {
    val ws = split(text, " ")
    transform(
      sequence(lit(0), ((size(ws) - 1) / segWords).cast("int")),
      i => array_join(slice(ws, i * segWords + 1, lit(segWords)), " "))
  }

  /** Distinct word-n-gram shingles per doc: (`id`, `shingle`). */
  private def shingleTable(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("shingle"))

  /** [[shingleTable]] with each shingle collapsed to its 64-bit
    * xxhash64 fingerprint (one codegen'd hash in the explode
    * projection). The minhash pipeline runs entirely on these longs:
    * signatures re-hash a fixed 8 bytes per seed instead of the ~25-byte
    * string (the map-side bill at corpus scale), and the verify sets
    * shuffle 8-byte elements. Jaccard over fingerprints == Jaccard over
    * strings up to a ~n²/2⁶⁵ collision (which could only ever MERGE two
    * distinct shingles — never split). */
  private def hashedShingleTable(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("__s"))
      .select(col("id"), xxhash64(col("__s")).as("shingle"))

  /** Decontamination: flag training documents that share any word-n-gram
    * with a benchmark/eval corpus — the standard guard against test-set
    * leakage into training data (n-gram overlap decontamination as used by
    * the GPT-3/PaLM data pipelines).
    *
    * Scale design (100 TB): the benchmark side reduces to its DISTINCT
    * n-gram set — eval suites are orders of magnitude smaller than the
    * corpus, so that set broadcasts (explicit hint) and the training side
    * streams through one broadcast hash join; the only shuffle is the
    * per-doc hit-count aggregate over the (rare) matches plus the id-keyed
    * join back to the doc list. The corpus text itself is never shuffled.
    * If the benchmark gram set ever outgrows broadcast range, swap the
    * broadcast join for a bloom-filter pre-filter (`might_contain`) in
    * front of a shuffled semi-join — same contract, two-phase.
    *
    * @return one row per training doc: (`idCol`, `n_hits` — number of
    *   distinct shared n-grams, `contaminated`). Survivors are the
    *   `!contaminated` rows; hit counts kept so callers can threshold. */
  def decontaminate(train: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchGrams = distinctGrams(benchmark, textCol, n)
    // shingles are distinct per doc and benchGrams is distinct, so the
    // inner join emits exactly one row per (doc, shared gram):
    // count == |grams(doc) ∩ benchGrams| with no DISTINCT aggregate
    val hits = shingleTable(train, idCol, textCol, n)
      .join(broadcast(benchGrams), "shingle")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    hitReport(train, idCol, hits)
  }

  /** Scale path for [[decontaminate]] when the benchmark gram set outgrows
    * broadcast range: a bloom filter over the benchmark grams (built
    * distributed, `fpp`-tunable) prefilters the corpus gram stream
    * NARROWLY — before any shuffle — and an exact shuffled semi-join on
    * the few survivors removes the bloom's false positives. Output is
    * identical to [[decontaminate]] (spec-enforced); the trade is two
    * passes over the (small) benchmark side — one cached materialization
    * for sizing + sketch build, one lazy recompute for the verification
    * join — and a driver-held sketch instead of a broadcast hash table.
    *
    * NOTE: building the sketch runs eagerly when this is called.
    *
    * @param expectedGrams sizing hint for the bloom filter; defaults to
    *   counting the benchmark gram set. */
  def decontaminateBloom(train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.01,
      expectedGrams: Option[Long] = None): DataFrame = {
    val benchGrams = distinctGrams(benchmark, textCol, n)
    // cache across the (up to two) eager sketch actions, release before
    // returning: the lazy verification join recomputes the gram set once
    // instead of pinning executor memory for the caller's lifetime
    benchGrams.persist()
    val bloom = try {
      val nGrams = expectedGrams.getOrElse(benchGrams.count())
      benchGrams.stat.bloomFilter("shingle", math.max(nGrams, 1L), fpp)
    } finally benchGrams.unpersist()
    val mightContain = udf((s: String) => s != null && bloom.mightContain(s))
    val hits = shingleTable(train, idCol, textCol, n)
      .filter(mightContain(col("shingle")))   // narrow: kills ~all grams
      .join(benchGrams, "shingle")            // exact: removes bloom FPs
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    hitReport(train, idCol, hits)
  }

  /** Near-dup clustering: transitive closure over similarity pairs — the
    * step after any pair-generating dedup ([[jaccardJoin]],
    * [[minHashJoin]], [[simHashJoin]], [[embeddingNearDup]]) that turns
    * pairwise matches into dup GROUPS with one canonical survivor each
    * (A~B and B~C puts A,C in one group even if never compared directly).
    * Reuses the DBSCAN connected-components engine
    * ([[ConnectedComponents.run]]: partition-local union-find contraction
    * + min-label loop, driver fast path for small contracted graphs).
    *
    * @param pairs (`a_id`, `b_id`) long id pairs.
    * @param docs  one row per `idCol` — docs in no pair become singleton
    *   groups of themselves.
    * @return (`idCol`, `canonical_id` — min id in the dup group,
    *   `is_survivor`). Deduplicated corpus = the `is_survivor` rows. */
  def dupGroups(pairs: DataFrame, docs: DataFrame, idCol: String): DataFrame = {
    val comp = ConnectedComponents.run(
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    docs.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("comp"), col("id")).as("canonical_id"))
      .withColumn("is_survivor", col(idCol) === col("canonical_id"))
  }

  /** Retract a batch of REMOVED documents from a standing [[dupGroups]]
    * table — the retraction path a leakage-safe split (q222) needs: a
    * removed doc may have been its cluster's canonical id, or a BRIDGE
    * whose loss splits the near-dup cluster, and a stale canonical
    * would silently re-key the split assignment of every surviving
    * member. Like decremental DBSCAN, the state stores no edges, so
    * exactly the groups that lost a member re-derive their pair graph:
    * similarity pairs never cross group (= connected-component)
    * boundaries, so re-running the pair join over the affected
    * survivors alone sees every edge the re-grouping needs; untouched
    * groups pass through byte-identical.
    *
    * Output equals `dupGroups(pairsOf(survivors), survivors, idCol)`
    * from scratch (spec-enforced; q232 folds a 10% retraction against
    * the from-scratch DuckDB oracle).
    *
    * @param groups the standing (`idCol`, canonical_id, is_survivor)
    * @param docs the doc table pairs are derived from (pre-retraction;
    *   removed ids are dropped here)
    * @param removeIds batch to retract (absent ids are ignored)
    * @param pairsOf the similarity join used to build the state, e.g.
    *   `d => jaccardJoin(d, idCol, "text", 3, 0.5)` — applied only to
    *   the affected groups' surviving docs */
  def retractDocs(groups: DataFrame, docs: DataFrame, removeIds: DataFrame,
      idCol: String, pairsOf: DataFrame => DataFrame): DataFrame = {
    val rm = removeIds.select(col(idCol)).distinct()
    val touched = groups.join(rm, Seq(idCol), "left_semi")
      .select("canonical_id").distinct()
    val kept = groups.join(rm, Seq(idCol), "left_anti")
    val untouched = kept
      .join(touched, Seq("canonical_id"), "left_anti")
      .select(col(idCol), col("canonical_id"), col("is_survivor"))
    val affectedDocs = docs
      .join(kept.join(broadcast(touched), "canonical_id").select(idCol),
        Seq(idCol), "left_semi")
    untouched.unionByName(
      dupGroups(pairsOf(affectedDocs), affectedDocs, idCol))
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word-n-gram shingles whose globally FIRST occurrence (min doc id —
    * deterministic, corpus order-free) is this document. High-novelty
    * docs contribute new content; near-zero novelty marks trailing
    * near-duplicates and template spam without any pairwise join — the
    * streaming-corpus complement of [[jaccardJoin]].
    *
    * Scale shape (100 TB): the shingle explode is narrow; the
    * first-occurrence pick is ONE hash aggregate on shingle text
    * (min(id) — no window, no sort), and attribution is an equi-join
    * back on the same shingle key feeding a per-doc count aggregate.
    * Cost is linear in corpus gram volume, vs the similarity join's
    * Σ df² — this is the pass you can ALWAYS afford.
    *
    * @return (`idCol`, n_shingles, n_novel, novelty = n_novel/n_shingles
    *   rounded to 6) — docs shorter than `n` words have no shingles and
    *   drop out. */
  def noveltyReport(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // persisted: the shingle table feeds both the first-occurrence
    // aggregate and the attribution join probe (dedupSegments lifecycle)
    val sh = shingleTable(docs, idCol, textCol, n).persist()
    val firsts = sh.groupBy("shingle").agg(min(col("id")).as("first_id"))
    sh.join(firsts, "shingle")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
  }

  /** Distinct word-n-gram set of a corpus: (`shingle`). */
  private def distinctGrams(docs: DataFrame, textCol: String,
      n: Int): DataFrame =
    docs.select(explode(TextFunctions.shingles(col(textCol), n))
      .as("shingle")).distinct()

  /** Left-join per-doc hit counts back onto the full doc list. */
  private def hitReport(train: DataFrame, idCol: String,
      hits: DataFrame): DataFrame =
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))

  /** Pairs (a_id, b_id), a_id < b_id, streamed lazily from a sorted
    * posting-list column `ids` — no self-join, no re-shuffle, and no
    * per-row pair array (a stopword-grade posting would otherwise
    * materialize df²/2 structs inside one row before the explode could
    * emit anything; see [[graft.functions.ExplodePostingPairs]]). */
  private def postingPairs: Column =
    graft.functions.PairExpressions.explodePostingPairs(col("ids"))

  /** Exact n-gram Jaccard similarity self-join via inverted index: one
    * shuffle builds posting lists per shingle, pairs are generated in
    * place from each sorted posting list, intersection sizes come from a
    * `groupBy(pair).count` — verification never touches the shingle
    * arrays, so per-candidate cost is a counter bump, not a set
    * intersection. Candidate volume is Σ_shingle df(shingle)²/2; prefer
    * [[jaccardJoinPrefix]] when the shingle document-frequency
    * distribution is heavy-tailed (natural-language corpora) and that
    * sum explodes.
    * @return (`a_id`, `b_id`, `jac`) with a_id < b_id and jac ≥ minJaccard.
    * @param maxDocFreq shingles appearing in more docs than this are dropped
    *   from the index (they only generate candidate pairs, never decide
    *   membership alone; with verification through intersection counts this
    *   changes recall only for pairs whose ENTIRE overlap is ultra-frequent
    *   shingles — disabled by default (Int.MaxValue) for exactness. */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // each doc's distinct-shingle count rides along from the SAME row the
    // shingles came from — zero size joins anywhere downstream
    val sh = docs.select(col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), n).as("toks"))
      .select(col("id"), size(col("toks")).cast("long").as("sz"),
        explode(col("toks")).as("shingle"))

    // shuffle 1 (groupBy shingle): posting lists of (id, sz), sorted by id.
    // Pairs are generated in place from each list — no self-join — with the
    // AllPairs length filter (min sz ≥ t·max sz, lossless) fused into the
    // native kernel so infeasible pairs never reach the pair shuffle.
    // Postings longer than maxDocFreq are dropped whole (stopword-style
    // pruning; lossy only for pairs whose entire overlap is ultra-frequent).
    val postings = sh.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("id"), col("sz")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val pruned =
      if (maxDocFreq == Int.MaxValue) postings
      else postings.filter(size(col("ids")) <= maxDocFreq)
    val pairs = pruned.select(
      graft.functions.PairExpressions.explodePostingPairsWithSize(
        col("ids"), minJaccard)) // generator -> a_id, b_id, a_sz, b_sz

    // shuffle 2 (groupBy pair): |A ∩ B| = how many postings emitted the
    // pair. Sizes are part of the key (constant per pair, so the group is
    // the same group) — jac comes straight off the aggregate, join-free.
    pairs.groupBy("a_id", "b_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("inter"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jac"))
      .filter(col("jac") >= minJaccard)
  }

  /** Exact n-gram CONTAINMENT self-join: emits pairs where either doc's
    * shingle set is mostly inside the other's —
    * cont_a = |A∩B| / |A| (how much of A lives in B), and
    * symmetrically cont_b. This is the near-dup case Jaccard
    * structurally misses: a paragraph quoted whole inside a long
    * document has containment ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0, so a
    * Jaccard-thresholded dedup keeps both copies.
    *
    * Same two-exchange inverted-index plan as [[jaccardJoin]] — but
    * with NO length filter: containment admits none (a tiny A inside a
    * huge B is exactly the target), so the posting-pair kernel runs at
    * threshold 0 and `maxDocFreq` is the one pruning knob that matters
    * at corpus scale (a stopword-grade shingle generates df²/2
    * candidate pairs and decides no containment by itself).
    *
    * @return (a_id, b_id, inter, cont_a, cont_b) with a_id < b_id and
    *   max(cont_a, cont_b) ≥ minContain; each cont is one division of
    *   exact longs (cross-engine stable, no rounding needed) */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minContain: Double,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    require(minContain > 0.0 && minContain <= 1.0,
      s"minContain in (0, 1], got $minContain")
    val sh = docs.select(col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), n).as("toks"))
      .select(col("id"), size(col("toks")).cast("long").as("sz"),
        explode(col("toks")).as("shingle"))
    val postings = sh.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("id"), col("sz")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val pruned =
      if (maxDocFreq == Int.MaxValue) postings
      else postings.filter(size(col("ids")) <= maxDocFreq)
    val pairs = pruned.select(
      graft.functions.PairExpressions.explodePostingPairsWithSize(
        col("ids"), 0.0))
    pairs.groupBy("a_id", "b_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("inter"))
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("inter").cast("double") / col("a_sz")).as("cont_a"),
        (col("inter").cast("double") / col("b_sz")).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= minContain)
  }

  /** Exact Jaccard self-join via a PREFIX-FILTERED inverted index (the
    * AllPairs/PPJoin prefix principle, Bayardo et al. WWW'07 / Xiao et
    * al. WWW'08): order every doc's shingles by a global rarest-first
    * total order (ascending document frequency, ties by shingle value)
    * and index only the first `sz − ceil(t·sz) + 1` of them. Two docs
    * with Jaccard ≥ t MUST share an indexed prefix shingle (pigeonhole
    * on the ≥ ceil(t·sz) overlapping shingles), so candidate generation
    * over the prefix index is lossless; exact verification by full-set
    * intersection makes the result identical to [[jaccardJoin]]
    * (spec-enforced).
    *
    * WHEN TO USE WHICH: candidate volume here is Σ over PREFIX postings
    * of df² — on Zipfian corpora the high-df (stopword) shingles land
    * outside the prefix and the sum collapses by orders of magnitude,
    * while [[jaccardJoin]]'s full Σdf² blows up. The flip side is
    * per-candidate cost: verification intersects the two full shingle
    * arrays (shuffled to each candidate), vs. jaccardJoin's counter
    * bump. On corpora with near-uniform df (e.g. the synthetic fixture
    * corpus: max df ≈ tens) prefix filtering prunes little and the
    * array-hauling verification dominates — measured 2.5× slower at
    * sf0.1 — which is why [[jaccardJoin]] stays the default and the
    * benchmark path.
    *
    * @return (`a_id`, `b_id`, `jac`) with a_id < b_id and jac ≥ minJaccard.
    * @param maxDocFreq prefix-index posting lists longer than this are
    *   dropped whole (stopword-style pruning; verification stays exact on
    *   the surviving candidates — recall only drops for pairs whose ENTIRE
    *   prefix overlap is ultra-frequent shingles). Disabled by default
    *   (Int.MaxValue) for exactness. */
  def jaccardJoinPrefix(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    // shuffle 1 (groupBy shingle): document frequency AND the re-exploded
    // (df, shingle, id) rows come out of ONE aggregation — no df join
    val withDf = sh.groupBy("shingle")
      .agg(collect_list(col("id")).as("ids"))
      .select(col("shingle"), size(col("ids")).as("df"),
        explode(col("ids")).as("id"))
    // shuffle 2 (groupBy id): each doc's complete shingle set, sorted
    // rarest-first — feeds BOTH prefix selection and exact verification.
    // Persisted without an explicit unpersist: the result is returned
    // lazily, so release can't happen before the caller materializes it —
    // the cache is reclaimed by the ContextCleaner once the plan is GC'd
    // (same lifecycle as Dbscan.run's internal caches; contrast
    // decontaminateBloom, whose eager build CAN release explicitly).
    val docArr = withDf.groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("ts"))
      .select(col("id"),
        expr("transform(ts, t -> t.shingle)").as("toks"))
      .persist()
    val sz = size(col("toks"))
    // prefix length = sz − ⌈t·sz⌉ + 1. The epsilon guards against fl(t·sz)
    // landing one ulp ABOVE an exact integer product (e.g. 0.07·100 →
    // 7.000000000000001), which would shorten the prefix by one and lose
    // boundary pairs; erring low only lengthens the prefix — more
    // candidates, still lossless (verification is exact).
    val prefixLen =
      sz - ceil(sz * lit(minJaccard) - lit(1e-9)).cast("int") + 1
    val prefix = docArr.select(col("id"),
      explode(slice(col("toks"), lit(1), prefixLen)).as("shingle"))
    // shuffle 3: prefix posting lists → candidate pairs in place
    val postings = prefix.groupBy("shingle")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val pruned =
      if (maxDocFreq == Int.MaxValue) postings
      else postings.filter(size(col("ids")) <= maxDocFreq)
    val cand = pruned.select(postingPairs) // generator -> a_id, b_id
      .distinct()
    // exact verification on the (rare) candidates: two id-keyed hash joins
    // against the complete per-doc sets. No broadcast hint: docArr is one
    // row per doc — tiny at test SFs (AQE broadcasts at runtime), possibly
    // billions of rows at corpus scale (AQE keeps the join shuffled).
    cand
      .join(docArr.select(col("id").as("a_id"), col("toks").as("a_toks")),
        "a_id")
      .join(docArr.select(col("id").as("b_id"), col("toks").as("b_toks")),
        "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_toks"), col("b_toks")))
          .cast("long").as("inter"),
        size(col("a_toks")).cast("long").as("a_sz"),
        size(col("b_toks")).cast("long").as("b_sz"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jac"))
      .filter(col("jac") >= minJaccard)
  }

  /** MinHash signatures over a prebuilt shingle table (`id`, `shingle`):
    * for each of k hash functions, the minimum xxhash64(shingle, seed)
    * over the doc's shingles — one [[graft.functions.MinHashSignature]]
    * aggregate (identical hash values to the k-column
    * `min(xxhash64(shingle, i))` formulation, without its k-wide codegen
    * compile or k shuffle buffer slots).
    * @return (`id`, `sig`: array<long>). */
  def minHashSignatures(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy("id")
      .agg(graft.functions.MinHashAgg.minhash(col("shingle"), k).as("sig"))

  /** MinHash signatures straight from documents. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    minHashSignatures(shingleTable(docs, idCol, textCol, n), k)

  /** MinHash-LSH candidate pairs: docs sharing ≥1 of `bands` bands (each of
    * `rowsPerBand` signature positions). ONE shuffle: group the banded
    * signatures into (band, key) posting lists and generate pairs in place
    * with the native kernel — no self-join (which would scan and shuffle
    * the banded table twice). @return (`a_id`, `b_id`), a_id < b_id. */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("key"))): _*))
          .as("bk"))
      .groupBy(col("bk.band"), col("bk.key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(postingPairs) // generator -> a_id, b_id
      .distinct()

  /** MinHash+LSH near-dup join, exact-verified: LSH candidates filtered by
    * TRUE n-gram Jaccard ≥ minJaccard. Output identical to
    * [[jaccardJoin]] up to LSH recall (tune bands/rowsPerBand so the
    * candidate probability at minJaccard is ≈1).
    * @return (`a_id`, `b_id`, `jac`). */
  def minHashJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, k: Int = 64, bands: Int = 16): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"need 1 <= bands <= k with k % bands == 0 (got k=$k, bands=$bands); " +
        "bands > k would make every band key an empty slice — all-pairs, " +
        "not LSH")
    val rowsPerBand = k / bands
    // signatures AND per-doc shingle sets come from ONE groupBy(id)
    // aggregate over the hashed shingle table — the two used to be
    // separate aggregations keyed identically, which shuffled the
    // corpus-sized (60M rows at the 1M-doc diagnostic) shingle stream
    // TWICE and cached it besides (guide §2.4: operations keyed the
    // same way share one exchange). The combined per-doc table (1 row
    // per doc) is what persists — three consumers: band explode + the
    // two verify joins.
    val docTable = hashedShingleTable(docs, idCol, textCol, n)
      .groupBy("id")
      .agg(graft.functions.MinHashAgg.minhash(col("shingle"), k).as("sig"),
        collect_list(col("shingle")).as("toks"))
      .persist()
    val cand = lshCandidates(docTable.select("id", "sig"), bands,
      rowsPerBand)

    // verify candidates against per-doc shingle SETS (one row per doc,
    // shingles are already distinct): two hash joins keyed on doc id —
    // candidate pairs are rare post-LSH, so the intersection runs on a
    // few rows instead of re-joining the full exploded shingle table
    val docSets = docTable.select("id", "toks")
    val out = cand
      .join(docSets.select(col("id").as("a_id"), col("toks").as("a_toks")),
        "a_id")
      .join(docSets.select(col("id").as("b_id"), col("toks").as("b_toks")),
        "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_toks"), col("b_toks")))
          .cast("long").as("inter"),
        size(col("a_toks")).cast("long").as("a_sz"),
        size(col("b_toks")).cast("long").as("b_sz"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jac"))
      .filter(col("jac") >= minJaccard)
    out
  }

  /** Persistable near-dup INDEX of a corpus: one row per doc carrying
    * its minhash signature and distinct shingle set — everything an
    * incremental probe needs. Band keys are derived from the signature
    * at probe time, so the stored layout is independent of the banding
    * choice. Build once, `write.parquet` — ingest batches then dedup
    * against the store without ever re-reading corpus text (the
    * build-once / serve-many shape of [[AnnSearch.ivfTopKPrebuilt]]).
    * @return (`id`, `sig`: array<long>, `toks`: array<long> — the
    *   distinct shingle FINGERPRINTS; rebuild any pre-hash-first index
    *   before probing it with this version). */
  def minHashIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int = 64): DataFrame =
    // ONE groupBy(id) aggregate produces both columns — the former
    // two-aggregate + join shape shuffled the corpus-sized shingle
    // stream twice and re-joined what one exchange already co-located
    // (same §2.4 rationale as minHashJoin)
    hashedShingleTable(docs, idCol, textCol, n)
      .groupBy("id")
      .agg(graft.functions.MinHashAgg.minhash(col("shingle"), k).as("sig"),
        collect_list(col("shingle")).as("toks"))

  /** Retract removed documents from a persisted [[minHashIndex]] —
    * deletion's answer at the INDEX level, completing the standing-
    * state trio (clusters: [[IncrementalDbscan.removePoints]], groups:
    * [[retractDocs]], index: here). EXACT by construction: an index
    * row derives from its document alone (signature + shingle set —
    * no cross-doc state), so dropping the removed rows IS the rebuild
    * over the survivors, bit for bit (spec-enforced), at one anti-join
    * over the index — no corpus text is re-read. Retract, persist the
    * new parquet, and every later [[minHashJoinAgainst]] probe is
    * incapable of matching a removed document (q233 oracles the
    * retract-then-probe composition).
    * @param removeIds batch to retract, keyed by `idCol`. */
  def retractFromIndex(index: DataFrame, removeIds: DataFrame,
      idCol: String): DataFrame =
    index.join(removeIds.select(col(idCol).as("id")).distinct(),
      Seq("id"), "left_anti")

  /** Append an ingested batch to a persisted [[minHashIndex]] —
    * [[retractFromIndex]]'s dual, closing the index CRUD square. An
    * index row derives from its document alone, so appending the
    * batch's freshly-built rows IS the rebuild over old ∪ new, bit for
    * bit (q239 oracles append-then-probe against the naive cross-pair
    * Jaccard over the grown store); only the batch's text is read.
    * Ids must be fresh — a re-ingested id would hold two rows
    * ([[retractFromIndex]] first for replace semantics). */
  def appendToIndex(index: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, n: Int, k: Int = 64): DataFrame =
    index.unionByName(minHashIndex(newDocs, idCol, textCol, n, k))

  /** Incremental near-dup join: a NEW document batch against an
    * existing [[minHashIndex]] — the steady-state ingest path, where
    * rebuilding the all-pairs join over old ∪ new would redo corpus
    * work per batch. Candidates come from an LSH band equi-join of the
    * batch's band keys against the index's (both derived from stored /
    * freshly-computed signatures); the exact Jaccard verify runs on the
    * STORED shingle sets. Cost scales with the batch and its candidate
    * fan-out, never the corpus size.
    *
    * Output matches a full [[minHashJoin]] over old ∪ new restricted to
    * (new, old) pairs (spec-enforced); within-batch duplicates are NOT
    * reported — run the batch through [[minHashJoin]] separately if
    * needed.
    * @return (`new_id`, `idx_id`, `jac`), jac ≥ minJaccard. */
  def minHashJoinAgainst(index: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, n: Int, minJaccard: Double,
      k: Int = 64, bands: Int = 16): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"need 1 <= bands <= k with k % bands == 0 (got k=$k, bands=$bands)")
    val rowsPerBand = k / bands
    // ids only through the band join — token arrays would be replicated
    // once per band; candidates are rare post-LSH, so the verify joins
    // back to the stored sets instead (minHashJoin's shape)
    def banded(df: DataFrame, side: String): DataFrame =
      df.select(col("id").as(s"${side}_id"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
                .as("key"))): _*)).as("bk"))
        .select(col(s"${side}_id"),
          col("bk.band").as("band"), col("bk.key").as("key"))
    // the batch index is small (one ingest batch) — cached while its
    // band join and verify both read it
    val newIdx = minHashIndex(newDocs, idCol, textCol, n, k).persist()
    val cand = banded(newIdx, "new")
      .join(banded(index, "idx"), Seq("band", "key"))
      .filter(col("new_id") =!= col("idx_id")) // re-ingested docs
      .select("new_id", "idx_id")
      .distinct() // a pair can share several bands
    cand
      .join(newIdx.select(col("id").as("new_id"),
        col("toks").as("new_toks")), "new_id")
      .join(index.select(col("id").as("idx_id"),
        col("toks").as("idx_toks")), "idx_id")
      .select(col("new_id"), col("idx_id"),
        size(array_intersect(col("new_toks"), col("idx_toks")))
          .cast("long").as("inter"),
        size(col("new_toks")).cast("long").as("a_sz"),
        size(col("idx_toks")).cast("long").as("b_sz"))
      .select(col("new_id"), col("idx_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jac"))
      .filter(col("jac") >= minJaccard)
  }

  /** Embedding-cosine near-duplicate pairs (exact): all unordered pairs
    * with cosine ≥ minCos. O(n²) candidates — the correctness baseline;
    * [[embeddingNearDupLsh]] is the scale path.
    * @return (`a_id`, `b_id`, `cos`), a_id < b_id. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    import graft.functions.VectorExpressions.dotProduct
    // norms hoisted to per-row projections (one fold per vector, not per
    // pair); values bit-identical to the per-pair formulation. The a-side
    // is repartitioned because the theta-join runs as a broadcast nested
    // loop streaming it — a single-file input would otherwise put the
    // whole O(n²) cosine scan on one core.
    val a = emb.select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
      .repartition(col("a_id"))
      .withColumn("a_n", dotProduct(col("a_v"), col("a_v")))
    val b = emb.select(col(idCol).as("b_id"), col(vecCol).as("b_v"))
      .withColumn("b_n", dotProduct(col("b_v"), col("b_v")))
    val dp = dotProduct(col("a_v"), col("b_v"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dp / sqrt(col("a_n") * col("b_n"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Scale path for embedding near-dup: random-hyperplane LSH (Charikar) —
    * the sign pattern of `nPlanes` fixed pseudo-random projections buckets
    * similar directions together; `bands` band equi-joins generate
    * candidates, exact cosine verifies. Deterministic: hyperplanes are
    * seeded by (plane index, dimension) hashes.
    * Recall < 1 by construction (tested empirically); precision exact. */
  def embeddingNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double, nPlanes: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    // projection p of vector v: Σ_d v[d] * h(p, d), h = deterministic ±1
    val v = col(vecCol).cast("array<double>")
    val signBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
          x * when(pmod(xxhash64(lit(p), d, lit(seed)), lit(2)) === 0, 1.0)
            .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBits.reduce(_ + _).as("sig"))
    val rowsPerBand = nPlanes / bands
    val banded = sig.select(col("id"), col("v"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * rowsPerBand)
            .bitwiseAND(lit((1L << rowsPerBand) - 1)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("v"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.v").as("a_v"), col("y.v").as("b_v"))
      .distinct()
    val dp = graft.functions.VectorExpressions.dotProduct(col("a_v"), col("b_v"))
    val na = graft.functions.VectorExpressions.dotProduct(col("a_v"), col("a_v"))
    val nb = graft.functions.VectorExpressions.dotProduct(col("b_v"), col("b_v"))
    cand.select(col("a_id"), col("b_id"), (dp / sqrt(na * nb)).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** SemDeDup-style semantic dedup (Abbas et al., 2023): embeddings are
    * k-means-clustered first, then near-duplicate pruning runs ONLY
    * within each cluster — the pairwise cosine work drops from O(n²)
    * to O(Σ_c |c|²), which is what makes semantic dedup tractable on a
    * web-scale corpus (the paper's setting; clusters are the unit of
    * parallelism). Keep rule, deterministic and order-free: a row is
    * dropped iff SOME SMALLER-id row of the same cluster sits within
    * `minCos` — every duplicate neighborhood keeps exactly its minimal
    * id (transitively: the chain's minimum survives, matching
    * [[dupGroups]]' min-representative convention).
    *
    * Scale shape: the assignments join and the pairwise step shuffle by
    * cluster id ONCE; within a cluster the pair scan is the hoisted-norm
    * cosine (one fold per row, codegen'd per pair). The dominant cost —
    * Σ|c|² — is controlled by k (more clusters → smaller quadratic
    * blocks); skewed giant clusters are the known failure mode, so k
    * should scale with corpus size (or recurse on oversized clusters).
    *
    * Determinism: cosine is the exact fixed-order fold on quantized-free
    * raw vectors — identical in SQL — and the drop decision is a pure
    * EXISTS, so the output is insensitive to partitioning and join
    * order.
    *
    * @param points (`idCol`, `vecCol`); @param clusters (`idCol`,
    *   `cluster`) — e.g. [[KMeans.fit]] output
    * @return (`idCol`, `cluster`, `kept`) — every input row, flagged. */
  def semDedup(points: DataFrame, idCol: String, vecCol: String,
      clusters: DataFrame, minCos: Double): DataFrame = {
    import graft.functions.VectorExpressions.dotProduct
    // persisted: pts feeds both pair sides AND the final left join —
    // uncached, the points scan + cluster join + norm would execute
    // three times per action (ContextCleaner lifecycle, as elsewhere)
    val pts = points.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(clusters.select(col(idCol).as("id"), col("cluster")), "id")
      .withColumn("n", dotProduct(col("v"), col("v")))
      .persist()
    val a = pts.select(col("cluster"), col("id").as("a_id"),
      col("v").as("a_v"), col("n").as("a_n"))
    val b = pts.select(col("cluster"), col("id").as("b_id"),
      col("v").as("b_v"), col("n").as("b_n"))
    val cos = dotProduct(col("a_v"), col("b_v")) /
      sqrt(col("a_n") * col("b_n"))
    // ids with a smaller-id near-neighbor in their cluster: the drop set
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("b_id") < col("a_id") && cos >= minCos)
      .select(col("a_id").as("id")).distinct()
    pts.join(dropped.withColumn("hit", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("hit").isNull.as("kept"))
  }

  /** SimHash 64-bit fingerprint per doc (Charikar's similarity hash, as
    * popularized for web-scale near-dup by Manku et al., WWW'07): sign of
    * the per-bit FREQUENCY-WEIGHTED sum of token hash bits (each token
    * occurrence votes, so repeated terms weigh more — hamming distance
    * then tracks cosine of the term-frequency vectors). Pure relational:
    * explode tokens → 64 per-bit ±1 sums → assemble the fingerprint with
    * shiftleft/or — stays in whole-stage codegen (no UDF, no UDAF).
    * @param tokenHash per-token hash column; default xxhash64 (fastest).
    *   Pass [[TextFunctions.portableHash60]] for a DuckDB-reproducible
    *   fingerprint (bits 60-63 then always 0: every token votes −1 there).
    * @return (`id`, `simhash`: long). */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val summed = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    summed.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming. Candidate step:
    * split the 64-bit fingerprint into `maxHamming + 1` bands (pigeonhole:
    * any pair within the radius agrees on ≥1 full band), equi-join per band,
    * verify with bit_count(xor). @return (`a_id`, `b_id`, `hamming`). */
  def simHashJoin(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    // width == 64 (maxHamming == 0, exact-dup detection): the key is the
    // whole fingerprint — (1L << 64) - 1 would be 0 (JVM shifts mod 64)
    // and every doc would share key 0, degenerating to a cross join
    def key(b: Int): Column =
      if (width == 64) col("simhash")
      else shiftright(col("simhash"), b * width)
        .bitwiseAND(lit((1L << width) - 1))
    val banded = hashes.select(col("id"), col("simhash"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), key(b).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repetition: for each document, the fraction of its
    * distinct word n-gram windows that also occur in at least one
    * OTHER document — the span-level memorization/duplication signal
    * of suffix-style training-data dedup, complementing the within-doc
    * repetition ratio (Gopher) and the whole/near-doc detectors above.
    * Because the per-doc shingle set is DISTINCT, a gram's occurrence
    * count IS its document frequency, so "shared" = df ≥ 2.
    *
    * Scale shape: the corpus tokenizes ONCE into the cached (doc,
    * gram) pair table (native shingle kernel, narrow); gram document
    * frequencies are one hash aggregate of it; the df table joins back
    * on the gram key (vocabulary-sized — broadcast under AQE) and one
    * per-doc aggregate closes. The text itself never shuffles.
    *
    * @return (idCol, n_grams, n_shared, shared_frac) — documents
    *   shorter than n words have no windows and are omitted. */
  def crossDocShared(docs: DataFrame, idCol: String, textCol: String,
      n: Int, scale: Int = 6): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // persisted: the pair table feeds the df aggregate AND the join
    // probe — uncached, the corpus would tokenize twice. Released by
    // the ContextCleaner with the plan (the documented lifecycle).
    val g = docs.select(col(idCol),
      explode(TextFunctions.shingles(col(textCol), n)).as("gr"))
      .persist()
    val dfq = g.groupBy("gr").agg(count(lit(1)).as("df"))
    g.join(dfq, "gr")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_grams"), scale))
  }
}
