package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection — the character-level ExactSubstr
  * pass of "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2021), re-expressed as hash shuffles instead of a
  * distributed suffix array.
  *
  * A document substring is *duplicated* when the same `L`-char window
  * content occurs at two or more positions anywhere in the corpus
  * (including twice in the same document). Every duplicated substring of
  * length ≥ L is exactly the union of duplicated L-char windows, so
  * stride-1 windows + run merging recovers the same maximal spans a
  * suffix array would report — with only:
  *
  *   1. one shuffle of (id, pos, 128-bit window hash) rows, grouped by
  *      hash to count global window multiplicity (window text itself is
  *      never shuffled: two independent 64-bit xxhash64 seeds stand in
  *      for content equality — collision probability over W windows is
  *      ≈ W²/2¹²⁹, ~10⁻¹¹ even at 100 TB ≈ 10¹⁴ windows);
  *   2. one shuffle of the surviving duplicated positions by document to
  *      merge consecutive runs into maximal spans.
  *
  * The row bill is corpus_chars × ~32 bytes — the same order as the
  * 8-bytes-per-byte suffix array the paper builds, but embarrassingly
  * partitionable and with no global sort. Windows below multiplicity 2
  * (the overwhelming majority) die in the first aggregate's partial
  * (map-side) phase only when a window repeats within a partition;
  * cross-partition singletons do reach the shuffle — at 100 TB, budget
  * shuffle capacity for corpus_chars rows, or run
  * [[duplicatedSpansAnchored]]: content-defined 1/stride anchor
  * sampling + local match extension, the same spans minus a documented
  * (1−1/stride)^R miss rate per R-window region.
  */
object SubstringDedup {

  /** Maximal duplicated-window spans per document.
    *
    * @param docs input with (`idCol`: long, `textCol`: string)
    * @param l window length in characters (the paper's dedup threshold;
    *   its token threshold 50 ≈ 200+ chars — fixtures use smaller)
    * @return (`idCol`, span_start, span_len, n_windows): 1-based char
    *   offset of the span, its length in chars (windows in one
    *   consecutive run merge: run of k windows → span of k+L-1 chars),
    *   and the window count of the run. Documents with no duplicated
    *   window are absent. Spans from DIFFERENT runs may still overlap
    *   by < L chars (a gap in window starts shorter than the window);
    *   [[duplicatedCharStats]] unions them for char accounting. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      l: Int): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    val wins = windowHashes(docs, idCol, textCol, l)
    // Global window multiplicity. A count window over (h1, h2) would be
    // ONE shuffle but pays WindowExec's sort + per-group machinery on
    // millions of single-row groups (measured 3.2 s vs 0.8 s at sf0.1);
    // duplicated CONTENTS are the rare case (~0.4% of windows in the
    // fixtures, boilerplate at web scale), so a codegen'd hash aggregate
    // + semi-join wins: the dup-key table is small enough for AQE to
    // broadcast the probe (no second shuffle of the window stream), and
    // when a 100 TB corpus pushes it past the broadcast threshold the
    // same plan degrades gracefully to a shuffled semi-join. The window
    // stream is recomputed for the probe side instead of cached — it is
    // a cheap projection of the scan, and caching corpus_chars rows is
    // the wrong trade at scale.
    val dup = wins.join(dupWindowKeys(wins), Seq("h1", "h2"), "left_semi")
      .select(col("id"), col("pos"))
    mergeRuns(dup, l, idCol)
  }

  /** The (id, pos, h1, h2) window-hash stream shared by the stride-1
    * and anchored passes. The explode fans each doc out ~|text| times,
    * so upstream parallelism is multiplied into the window stream: a
    * small file that scans as 1-2 partitions would build and
    * shuffle-write millions of window rows in one task (measured 2.5 s
    * of the 3.2 s bill at sf0.1). Spreading the DOC rows first costs
    * only the raw text bytes; a corpus already wider than the session's
    * parallelism — any real 100 TB layout — skips this branch entirely
    * and never re-shuffles its text. getNumPartitions is plan metadata,
    * not a job. `sequence(1, n)` needs n ≥ 1 (descending sequences are
    * legal in Spark — a length filter, not a guard expression, keeps
    * short docs out).
    *
    * `anchorStride > 1` applies the anchor filter BETWEEN the two hash
    * projections, inside one codegen stage: h2 is then computed only
    * for the 1/stride survivors instead of every window — the same
    * rows as filtering afterwards, minus stride−1 of the h2 work on
    * the corpus-sized hot loop. */
  private def windowHashes(docs: DataFrame, idCol: String, textCol: String,
      l: Int, anchorStride: Long = 1L): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val h1 = spread
      .filter(length(col(textCol)) >= l)
      .select(col(idCol).as("id"),
        explode(sequence(lit(1), length(col(textCol)) - lit(l - 1)))
          .as("pos"),
        col(textCol).as("__t"))
      .select(col("id"), col("pos"),
        expr(s"substring(__t, pos, $l)").as("__w"))
      .select(col("id"), col("pos"), xxhash64(col("__w")).as("h1"),
        col("__w"))
    val kept =
      if (anchorStride > 1L)
        h1.filter(pmod(col("h1"), lit(anchorStride)) === 0)
      else h1
    kept.select(col("id"), col("pos"), col("h1"),
      xxhash64(lit("substr-dedup-2"), col("__w")).as("h2"))
  }

  /** Globally-duplicated window keys (multiplicity ≥ 2). The result
    * is CORPUS-DERIVED (its size scales with duplication, not a
    * constant), so it carries a shuffle-join hint: Spark's
    * compile-time size estimate for an aggregate child is a guess,
    * and on a 60M-token corpus the guessed-small broadcast collected
    * >1 GiB of keys to the driver (maxResultSize abort — the
    * bench-measured failure). The hint pins a shuffled hash join at
    * plan time (hash, not merge: no sort of the corpus-sized probe,
    * and the probe's (h1, h2) exchange is the aggregation's own);
    * AQE still converts to broadcast AT RUNTIME when the key set is
    * actually small, so the small-corpus path loses nothing.
    *
    * Used by the STRIDE-1 pass, whose window stream is cheap to
    * recompute for the probe side at fixture scale (hash-agg measured
    * 0.8 s vs 3.2 s for a count window at sf0.1). The ANCHORED pass
    * uses [[dupPositions]] instead — at 60M anchors the aggregate's
    * map-side hash tables spill and the probe re-scan doubles the
    * corpus bill (measured: 57-100 s agg + ~170 s semi-join vs 12 s
    * for the one-exchange sort pass). */
  private def dupWindowKeys(wins: DataFrame): DataFrame =
    wins.groupBy("h1", "h2")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("h1", "h2")
      .hint("shuffle_hash")

  /** The (id, pos) rows whose (h1, h2) window key is globally
    * duplicated (multiplicity ≥ 2) — the ANCHORED pass's multiplicity
    * check as ONE exchange: repartition the window stream by key, sort
    * within partitions, and stream a run-length pass that emits every
    * row of a key seen ≥ 2 times. Replaces the hash-aggregate +
    * left-semi pair, which (a) shuffled the stream twice, (b) spilled
    * the aggregate's map-side hash tables on tens of millions of
    * near-unique keys, and (c) recomputed the corpus-sized window scan
    * for the probe side (1M-doc profile: 12 s vs ~170 s end-to-end).
    * Same row SET, bit for bit: multiplicity is decided on the exact
    * (h1, h2) pair, ties/order are irrelevant downstream (distinct /
    * interval merge / run merge).
    *
    * Memory: O(1) per group — only a group's FIRST row buffers; the
    * second occurrence flushes it and the rest stream through. A
    * pathological billion-copy boilerplate key therefore streams,
    * never materializes. */
  private[graft] def dupPositions(wins: DataFrame,
      pin: Boolean = false): DataFrame = {
    val in = wins.select("id", "pos", "h1", "h2")
    val idType = in.schema("id").dataType
    val posType = in.schema("pos").dataType
    val sorted = in
      .repartition(col("h1"), col("h2"))
      .sortWithinPartitions("h1", "h2")
    val rdd0 = sorted.rdd.mapPartitions { it =>
      var curH1 = 0L
      var curH2 = 0L
      var have = false
      var first: org.apache.spark.sql.Row = null
      it.flatMap { r =>
        val h1 = r.getLong(2)
        val h2 = r.getLong(3)
        val row = org.apache.spark.sql.Row(r.get(0), r.get(1))
        if (!have || h1 != curH1 || h2 != curH2) {
          curH1 = h1; curH2 = h2; have = true; first = row
          Iterator.empty
        } else if (first != null) {
          val f = first; first = null
          Iterator(f, row)
        } else Iterator.single(row)
      }
    }
    // pin when the caller fans the result into several consumers —
    // RDD-level (ContextCleaner-managed, the cutSpans rule), duplicated
    // positions only (small by the same argument as the span state)
    val rdd = if (pin) rdd0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else rdd0
    wins.sparkSession.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType,
          nullable = false),
        org.apache.spark.sql.types.StructField("pos", posType,
          nullable = false))))
  }

  /** Gaps-and-islands run merge: consecutive duplicated starts become
    * one maximal span (pos − row_number is constant inside a run). */
  private def mergeRuns(dup: DataFrame, l: Int, idCol: String): DataFrame = {
    val wDoc = Window.partitionBy("id").orderBy("pos")
    dup
      .withColumn("__rn", row_number().over(wDoc))
      .groupBy(col("id"), (col("pos") - col("__rn")).as("__isl"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") - min("pos") + lit(l)).cast("long").as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col("id").as(idCol), col("span_start"), col("span_len"),
        col("n_windows"))
  }

  /** ANCHORED ExactSubstr — the shape that survives
    * corpus_chars > shuffle capacity (the stride-1 pass ships one row
    * per character to the multiplicity shuffle; at 100 TB that is the
    * bill). Two phases:
    *
    *  1. ANCHOR: only windows whose content hash satisfies
    *     `h1 mod stride = 0` enter the global multiplicity shuffle —
    *     a content-defined 1/stride sample (anchoring on content, not
    *     position, means the two copies of any duplicated region anchor
    *     at the SAME offsets inside it — a positional stride would
    *     de-align). Shuffle rows drop ~stride× (spec-measured).
    *  2. EXTEND locally: around every globally-duplicated anchor, the
    *     ±`extend`-window neighborhood re-enters a SECOND, tiny
    *     multiplicity check (both copies of a shared region have the
    *     same anchors, so both emit the same neighborhood windows and
    *     true duplicates reach multiplicity 2 there); runs then merge
    *     exactly as in the stride-1 pass.
    *
    * Recall contract (documented, spec-pinned):
    *  - NO false positives: every reported window is globally
    *    duplicated, and every reported span is contained in a stride-1
    *    span.
    *  - A duplicated region is DETECTED iff it contains ≥1 anchor:
    *    for a span of R windows that is ≈ 1 − (1 − 1/stride)^R — near
    *    1 for regions much longer than `stride` windows (the long
    *    memorized boilerplate ExactSubstr exists to cut), 1/stride at
    *    the bare-L floor.
    *  - Boundaries are EXACT when the region's internal anchor gaps and
    *    edge distances are ≤ `extend` windows (expected gap = stride;
    *    the default extend = 8×stride makes a truncated boundary a
    *    ~(1−1/s)^{8s} ≈ e⁻⁸ tail event per edge).
    *
    * @param stride content-sampling modulus (≥ 2; 1 would be stride-1)
    * @param extend neighborhood radius in windows (0 ⇒ 8 × stride)
    * @return same schema/semantics as [[duplicatedSpans]], minus the
    *   misses the contract above prices. */
  def duplicatedSpansAnchored(docs: DataFrame, idCol: String,
      textCol: String, l: Int, stride: Int, extend: Int = 0): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    require(stride >= 2, s"stride must be >= 2 (1 is duplicatedSpans), " +
      s"got $stride")
    val ext = if (extend > 0) extend else 8 * stride
    // phase 1: content-defined anchors — the ONLY corpus-sized stream
    // that reaches a shuffle is already 1/stride of the windows (and
    // h2 is computed for anchors only, inside the same codegen stage)
    val anchors = windowHashes(docs, idCol, textCol, l,
      anchorStride = stride.toLong)
    // ONE exchange + streamed run-length multiplicity (see
    // [[dupPositions]]) — the agg + semi-join pair shuffled the anchor
    // stream twice and re-ran the corpus-sized window scan for the
    // probe side (measured 1M-doc profile: ~170 s → 12 s). No pin:
    // the merged RANGES below are the (far smaller) pinned fan-out
    // point now, and they are this stream's single consumer.
    val dupAnchors = dupPositions(anchors)
    // phase 2: local extension — neighborhoods of duplicated anchors
    // only (corpus-independent volume: |dup anchors| × (2·ext+1)).
    // Neighborhoods as RANGES merged per doc: nearby anchors' ±ext
    // windows overlap ~ext/stride-fold, so merging BEFORE any join or
    // explode shrinks the stream ~(2·ext+1)-fold (measured at 1M
    // docs/5% dup: ~250M exploded positions vs ~4M ranges; merged
    // ranges are disjoint per doc, so the later explode emits each
    // position exactly once — no distinct needed)
    val nbrRanges0 = IntervalJoin.mergeIntervals(
        dupAnchors.select(col("id"),
          greatest(col("pos") - ext, lit(1)).as("__lo"),
          (col("pos") + ext).as("__hi")),
        Seq("id"), "__lo", "__hi")
      .select(col("id"), col("lo"), col("hi"))
    // pinned at the RDD layer (the cutSpans rule): three consumers —
    // the sizing count, the Bloom build, the snippet join — and one
    // row per merged neighborhood, so the pin is tiny while cutting
    // off the corpus-sized anchor scan + multiplicity exchange above
    val nbrRangesRdd = nbrRanges0.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nbrRanges = docs.sparkSession.createDataFrame(nbrRangesRdd,
      nbrRanges0.schema)
    val d = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
    // Pre-filter the DOC SCAN with a Bloom filter over hit doc-ids
    // (guide §3.2): the former left-semi join shuffled EVERY doc's
    // full text by id just to drop the non-hit ones on the other side
    // of the exchange — the single largest remaining shuffle of this
    // pass (full corpus text bytes) for a hit set that is a few
    // percent of docs on a realistic duplication profile. False
    // positives only add docs whose ranges-join below matches nothing
    // (the inner join is the exact filter), so the output is
    // bit-identical. The filter build is one tiny aggregate over the
    // pinned ranges; past `graft.substr.bloomMaxItems` distinct hit
    // docs (or for non-long ids) the semi-join fallback keeps the old
    // scale-graceful plan.
    val nRanges = nbrRanges.count()
    val bloomMax = sys.props.get("graft.substr.bloomMaxItems")
      .map(_.toLong).getOrElse(200_000_000L)
    val idIsLong =
      d.schema("id").dataType == org.apache.spark.sql.types.LongType
    val hitDocs =
      if (idIsLong && nRanges > 0 && nRanges <= bloomMax) {
        val bf = nbrRanges.stat.bloomFilter("id",
          math.max(nRanges, 64L), 0.01)
        val bfB = d.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((id: Long) => bfB.value.mightContainLong(id))
        d.filter(mightContain(col("id")))
      } else {
        // the hit-id set is corpus-derived (≈ every doc on a
        // template-heavy corpus) — same merge-hint rationale as
        // dupWindowKeys; AQE re-broadcasts small sets at runtime
        d.join(nbrRanges.select("id").distinct().hint("shuffle_hash"),
          Seq("id"), "left_semi")
      }
    // join texts against the MERGED RANGES (|ranges| rows, not
    // |positions| — the former position-side probe shuffled ~60× more
    // rows), snip out just the range's covering chars, and explode
    // windows from the short snippet: every window substring now
    // re-scans a ≤(hi−lo+l)-char snippet instead of the whole doc.
    // hitDocs still carries FULL TEXTS (corpus-sized before the Bloom
    // cut: ~1 GiB at 1M docs) — broadcasting it is never right; the 1M
    // bench run aborted on the driver maxResultSize collecting exactly
    // this table. substring(__t, lo, hi−lo+l) truncates at the doc end,
    // so the snippet-local explode bound min(hi, len−l+1) reproduces
    // the original pos ≤ len−l+1 filter exactly.
    val nbrWins = nbrRanges.join(hitDocs.hint("shuffle_hash"), Seq("id"))
      .select(col("id"), col("lo"),
        expr(s"substring(__t, CAST(lo AS INT), " +
          s"CAST(hi - lo + $l AS INT))").as("__snip"))
      .filter(length(col("__snip")) >= l)
      .select(col("id"), col("lo"), col("__snip"),
        explode(sequence(lit(1), length(col("__snip")) - lit(l - 1)))
          .as("__q"))
      .select(col("id"), (col("__q") + col("lo") - lit(1)).as("pos"),
        expr(s"substring(__snip, __q, $l)").as("__w"))
      .select(col("id"), col("pos"),
        xxhash64(col("__w")).as("h1"),
        xxhash64(lit("substr-dedup-2"), col("__w")).as("h2"))
    // same one-exchange multiplicity pass for the neighborhood stream
    // (it was recomputed for the probe side too — substring + two
    // hashes per neighborhood window, twice)
    val dup = dupPositions(nbrWins)
    mergeRuns(dup, l, idCol)
  }

  /** APPLY the ExactSubstr pass — the remediation step of Lee et al.
    * 2021: remove every corpus-duplicated character span from every
    * document (both copies; the paper's cut rule) and keep the rest.
    * Composition: [[duplicatedSpans]] → island merge
    * ([[IntervalJoin.mergeIntervals]] — spans from different runs can
    * overlap by < L chars) → the KEEP pieces are each island's left
    * complement (previous island's hi, default char 1) plus one tail
    * piece, spliced back in start order. A fully-duplicated document
    * comes back as the EMPTY string, not its original text.
    *
    * All relational: pieces are (start, len) rows, the splice is one
    * sort+concat aggregate per doc — no per-row text surgery UDF, and
    * the plan is two exchanges past the span pass itself.
    *
    * @return (`idCol`, n_chars, n_kept, text_cut) for EVERY input doc
    *   (unaffected docs keep their text verbatim). */
  def cutDuplicates(docs: DataFrame, idCol: String, textCol: String,
      l: Int): DataFrame =
    cutSpans(docs, duplicatedSpans(docs, idCol, textCol, l), idCol,
      textCol)

  /** [[cutDuplicates]] on the ANCHORED span pass — the 100 TB shape:
    * the corpus-sized window stream never reaches a shuffle (only the
    * 1/stride content anchors do), and the cut inherits
    * [[duplicatedSpansAnchored]]'s recall contract verbatim: every cut
    * char is inside a true stride-1 span (no over-cutting, ever); a
    * duplicated region survives uncut only when it dodged every anchor
    * (probability (1−1/stride)^R for R windows — vanishing for the
    * long boilerplate the pass exists to remove). Spec-pinned: the
    * anchored cut equals the stride-1 cut except for docs whose every
    * dup region is anchor-free. */
  def cutDuplicatesAnchored(docs: DataFrame, idCol: String,
      textCol: String, l: Int, stride: Int, extend: Int = 0): DataFrame =
    cutSpans(docs,
      duplicatedSpansAnchored(docs, idCol, textCol, l, stride, extend),
      idCol, textCol)

  /** The splice kernel shared by the stride-1 and anchored cuts:
    * island-merge `spans` ([[duplicatedSpans]] schema) and cut them
    * out of every document. */
  private def cutSpans(docs: DataFrame, spans: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val merged0 = IntervalJoin.mergeIntervals(
      spans
        .select(col(idCol).as("id"), col("span_start").as("lo"),
          (col("span_start") + col("span_len")).as("hi")),
      Seq("id"), "lo", "hi")
    // three readers (pre-pieces, tail pieces, the doc set) share one
    // computation. Pinned at the RDD layer, NOT DataFrame.persist():
    // a DataFrame cache entry lives in the session's CacheManager until
    // someone calls unpersist — which this lazily-returned plan has no
    // hook to do — while an RDD cache is dropped by the ContextCleaner
    // as soon as callers release the result lineage. One row per
    // duplicated island, so the pin is tiny.
    val mergedRdd = merged0.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val merged = docs.sparkSession.createDataFrame(mergedRdd, merged0.schema)
    val d = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
    val w = Window.partitionBy("id").orderBy("lo")
    // keep piece BEFORE each island: [prev island hi (default 1), lo)
    val pre = merged
      .select(col("id"), lag(col("hi"), 1, 1L).over(w).as("start"),
        col("lo"))
      .select(col("id"), col("start"), (col("lo") - col("start")).as("plen"))
    // keep piece AFTER the last island: [max hi, len+1)
    val tail = merged.groupBy("id").agg(max("hi").as("start"))
      .join(d, "id")
      .select(col("id"), col("start"),
        (length(col("__t")) + 1 - col("start")).as("plen"))
    val cuts = pre.unionByName(tail.select("id", "start", "plen"))
      .filter(col("plen") > 0)
      .join(d, "id")
      .select(col("id"),
        struct(col("start"),
          expr("substring(__t, CAST(start AS INT), CAST(plen AS INT))")
            .as("piece")).as("sp"))
      .groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(col("sp"))), x => x("piece")),
        "").as("__cut"))
    // a doc whose islands cover EVERYTHING has zero pieces — it must
    // come back empty, not fall through to its original text
    val affected = merged.select("id").distinct()
      .join(cuts, Seq("id"), "left")
      .select(col("id"), coalesce(col("__cut"), lit("")).as("__cut"))
    d.join(affected, Seq("id"), "left")
      .select(col("id").as(idCol),
        length(col("__t")).cast("long").as("n_chars"),
        length(coalesce(col("__cut"), col("__t"))).cast("long")
          .as("n_kept"),
        coalesce(col("__cut"), col("__t")).as("text_cut"))
  }

  /** Per-document duplicated-character accounting: how many characters
    * the ExactSubstr cut pass would touch. Character intervals of
    * [[duplicatedSpans]] runs are unioned (runs < L apart overlap), so
    * `dup_chars` is the exact size of the duplicated region.
    *
    * @return (`idCol`, n_chars, dup_chars, dup_frac): doc length, chars
    *   covered by ≥1 duplicated window, and their ratio rounded to 6
    *   places. Only documents with ≥1 duplicated window appear. */
  def duplicatedCharStats(docs: DataFrame, idCol: String, textCol: String,
      l: Int): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, l)
      .select(col(idCol), col("span_start").as("lo"),
        (col("span_start") + col("span_len")).as("hi"))
    val covered = IntervalJoin.unionLength(spans, Seq(idCol), "lo", "hi")
      .select(col(idCol), col("covered").as("dup_chars"))
    docs.select(col(idCol), length(col(textCol)).cast("long").as("n_chars"))
      .join(covered, Seq(idCol)) // inner: docs without dup windows drop
      .select(col(idCol), col("n_chars"), col("dup_chars"),
        round(col("dup_chars").cast("double") / col("n_chars"), 6)
          .as("dup_frac"))
  }
}
