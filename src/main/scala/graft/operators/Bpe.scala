package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** BPE (byte-pair encoding) merge learning over a document corpus — the
  * tokenizer-training half of the engine's tokenization surface (q27
  * counts tokens with a fixed BPE-ish regex; this LEARNS the merge table
  * that defines such a tokenizer), per the Sennrich et al. subword-NMT
  * algorithm: iteratively merge the most frequent adjacent symbol pair.
  *
  * Scale shape (the word-type decomposition): the corpus collapses ONCE
  * to its word-frequency table (one shuffle over words — the only pass
  * that ever touches corpus text), which is persisted and is the sole
  * input to every round. Per round: adjacent-pair extraction is a narrow
  * explode over word types, the weighted pair count is one aggregate,
  * and only the single argmax row is collected; the merge is then
  * applied as a narrow literal-pattern `replace` over the word-type
  * table. Round cost is O(|vocab| × avg word length) — independent of
  * corpus size after the first pass.
  *
  * Merge-application semantics (deterministic, engine-portable): the
  * winning pair `(l, r)` is replaced in the space-delimited symbol
  * string by a left-to-right non-overlapping scan (`replace` of
  * `" l r "` with `" lr "` on the space-padded string), applied three
  * times so runs of the same pair merge through (a run of four `a`s
  * fully pairs in two passes). This is the scan-based variant of greedy
  * BPE: for self-adjacent runs the merge POSITIONS can differ from the
  * canonical leftmost-first tokenizer, but the pass is identical in any
  * SQL engine with standard `replace` semantics, which is what makes
  * the merge table oracle-checkable. Argmax ties break on
  * (freq DESC, left ASC, right ASC).
  */
object Bpe {

  private val outSchema = StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("freq", LongType, nullable = false)))

  /** Learn `numMerges` merges from the space-separated words of
    * `textCol`. Stops early if no adjacent pair remains.
    *
    * Like [[PageRank.run]], a word-type table at or below
    * `localThreshold` rows runs the whole merge loop driver-side on the
    * collected (symbols, count) pairs — the corpus-collapsing aggregate
    * is still distributed, but the per-round argmax jobs (the dominant
    * cost: rounds × scheduler latency on an input that is only the
    * VOCABULARY) disappear. Java's literal `String.replace` scans
    * left-to-right non-overlapping exactly like Spark's `replace`, and
    * the tie-break compares UTF-8 bytes unsigned (= UTF8String binary
    * order), so both paths are bit-identical (spec-enforced).
    *
    * @return (step 1.., lhs, rhs, freq) — the ordered merge table
    *   ("lhs"/"rhs" rather than SQL-reserved left/right). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      localThreshold: Long = 1_000_000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    // corpus → word-type table; chars spaced out as the initial symbols
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("s"),
        col("cnt"))
      .persist()
    val vocabSize = words.count()
    val merges =
      if (vocabSize <= localThreshold)
        learnLocal(words.collect().map(r => (r.getString(0), r.getLong(1))),
          numMerges)
      else learnDistributed(words, numMerges)
    words.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges, 1), outSchema)
  }

  /** Small-vocabulary path: the merge loop over collected word types. */
  private def learnLocal(words0: Array[(String, Long)],
      numMerges: Int): Seq[Row] = {
    def lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, cnt) =>
        val syms = s.split(' ')
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { cand =>
          if (best == null) best = cand
          else {
            val ((bl, br), bf) = best
            val ((cl, cr), cf) = cand
            if (cf > bf || (cf == bf && (lt(cl, bl) ||
              (cl == bl && lt(cr, br))))) best = cand
          }
        }
        val ((l, r), f) = best
        merges += Row(step, l, r, f)
        val pat = s" $l $r "
        val rep = s" $l$r "
        words = words.map { case (s, cnt) =>
          // space-only trim: Java's String.trim strips every char
          // <= U+0020 and would silently delete control-char symbols
          // that Spark/DuckDB trim (space-only) keep
          (trimSpaces(
            s" $s ".replace(pat, rep).replace(pat, rep).replace(pat, rep)),
            cnt)
        }
        step += 1
      }
    }
    merges.toSeq
  }

  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Cluster-scale path: per-round distributed pair count + argmax. */
  private def learnDistributed(words: DataFrame,
      numMerges: Int): Seq[Row] = {
    var cur = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val ws = split(col("s"), " ")
      val best = cur
        .filter(size(ws) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), (size(ws) - 2)),
          j => struct(element_at(ws, j + 1).as("l"),
            element_at(ws, j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Row(step, l, r, f)
        val pat = s" $l $r "
        val rep = s" $l$r "
        def rep1(c: org.apache.spark.sql.Column) =
          replace(c, lit(pat), lit(rep))
        // localCheckpoint per round, like the other iterate-to-fixpoint
        // loops: without it round k's argmax replays all k-1 earlier
        // replace layers from the base table (O(rounds²) work and
        // unbounded plan depth at large merge budgets)
        cur = cur.select(
          trim(rep1(rep1(rep1(concat(lit(" "), col("s"), lit(" ")))))
            ).as("s"), col("cnt"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize words of `textCol` with a learned merge table: per doc,
    * the multiset size of resulting subword tokens (a compression-ratio
    * signal: tokens-per-word under the learned vocabulary). Applies the
    * merges in order with the same scan semantics as [[learnMerges]].
    * @return (idCol, n_words, n_tokens) */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spaced = concat(lit(" "),
      trim(regexp_replace(col("__w"), "(.)", "$1 ")), lit(" "))
    val merged = merges.foldLeft(spaced) { case (c, (l, r)) =>
      val pat = s" $l $r "
      val rep = s" $l$r "
      replace(replace(replace(c, lit(pat), lit(rep)),
        lit(pat), lit(rep)), lit(pat), lit(rep))
    }
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col(idCol), size(split(trim(merged), " ")).as("__t"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("__t")).as("n_tokens"))
  }
}
