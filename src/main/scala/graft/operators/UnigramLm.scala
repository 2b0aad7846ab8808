package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer learning — the other
  * tokenizer family a training-data pipeline meets beside BPE
  * ([[Bpe]]): a vocabulary of substring pieces with probabilities,
  * learned by EM over the corpus, serving tokenization as Viterbi
  * segmentation (Kudo 2018, "Subword Regularization", §3). This is the
  * hard-EM (Viterbi-EM) variant: the E-step segments every word with
  * the current piece scores, the M-step re-estimates piece counts from
  * the segmentations, and pruning keeps the top pieces — deterministic
  * end to end, so the whole loop unrolls into the DuckDB oracle
  * (q266/q267) exactly like the BPE rounds did.
  *
  * Numerics (the q139/q147 disciplines): piece scores are QUANTIZED
  * INTEGER log-probs — sq(x) = round(ln cnt(x)·1e9) − round(ln N·1e9)
  * as BIGINT, each ln rounded separately from exact integer counts —
  * so every Viterbi DP comparison is exact integer arithmetic; ties
  * break on the smallest split point (see [[viterbi]]), making the
  * segmentation engine- and partitioning-invariant.
  *
  * Scale shape: word frequencies are ONE shuffle over the corpus and
  * every later stage works on the DISTINCT-WORD table (the natural
  * unit — segmentation is a function of the word alone); the candidate
  * explode is bounded by word length × `maxPieceLen`; the E-step is a
  * NARROW map over distinct words with the vocab shipped as one
  * broadcast model object (the PQ-codebook rule: a tokenizer vocab is
  * model-sized — 32k–256k pieces — and must fit the driver by the same
  * contract every real tokenizer trainer assumes); pruning is a
  * TakeOrdered, never a global sort.
  */
object UnigramLm {

  /** (word, wf): corpus word frequencies — the one corpus-sized pass.
    * Empty tokens from repeated separators are dropped. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wf"))

  /** Seed vocabulary: every substring occurrence of length 1..
    * `maxPieceLen`, counted over the corpus (weighted by word
    * frequency; a substring occurring twice inside one word counts
    * twice). Pieces below `minCount` are dropped EXCEPT single
    * characters, which always survive — they are what keeps every
    * word segmentable in every round. */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame = {
    require(maxPieceLen >= 1, s"bad maxPieceLen $maxPieceLen")
    val grid = words
      .select(col("word"), col("wf"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("wf"), col("i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("k"))
      .filter(col("i") + col("k") <= length(col("word")))
      .select(substring_index_piece(col("word"), col("i"), col("k"))
        .as("piece"), col("wf"))
    grid.groupBy("piece").agg(sum("wf").as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
  }

  /** `substr(word, i+1, k)` with column offsets (Spark's `substring`
    * takes literal positions; the SQL function form takes columns). */
  private def substring_index_piece(word: Column, i: Column,
      k: Column): Column =
    word.substr(i + 1, k)

  /** Quantized integer log-prob scores over a (piece, cnt) vocab:
    * sq = round(ln cnt · 1e9) − round(ln Σcnt · 1e9), each ln rounded
    * separately so both engines compute the identical BIGINT. */
  def scores(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum("cnt").as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"),
        (round(log(col("cnt").cast("double")) * 1e9).cast("long")
          - round(log(col("tot").cast("double")) * 1e9).cast("long"))
          .as("sq"))
  }

  /** Viterbi segmentation of each distinct word under integer piece
    * scores: maximize Σ sq(piece); ties prefer the SMALLEST split
    * point at each position (scan order — equivalently the longest
    * final piece), which pins a unique segmentation both engines
    * reproduce. The vocab is collected and shipped as one broadcast
    * model object (see object doc); it must contain every single
    * character of the corpus or segmentation fails loudly.
    * @param vocabScores (piece, sq: long), pieces ≤ `maxPieceLen`
    * @return (word, start, piece) — 0-based start offsets. */
  def viterbi(words: DataFrame, vocabScores: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val model: Map[String, Long] = vocabScores.select("piece", "sq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(model.nonEmpty, "empty vocabulary")
    require(model.keys.forall(_.length <= maxPieceLen),
      s"vocab holds pieces longer than maxPieceLen=$maxPieceLen")
    val lMax = maxPieceLen
    val seg = udf { (word: String) =>
      val n = word.length
      val sc = Array.fill(n + 1)(Long.MinValue)
      sc(0) = 0L
      val bp = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - lMax)
        while (j < i) {
          if (sc(j) != Long.MinValue) {
            val p = model.get(word.substring(j, i))
            if (p.isDefined) {
              val cand = sc(j) + p.get
              // strict > keeps the smallest j on ties (scan ascending)
              if (cand > sc(i)) { sc(i) = cand; bp(i) = j }
            }
          }
          j += 1
        }
        require(sc(i) != Long.MinValue,
          s"unsegmentable prefix '${word.substring(0, i)}' — the vocab " +
            "is missing a single character of the corpus")
        i += 1
      }
      val out = scala.collection.mutable.ListBuffer.empty[(Int, String)]
      var pos = n
      while (pos > 0) {
        val j = bp(pos)
        out.prepend((j, word.substring(j, pos)))
        pos = j
      }
      out.toSeq
    }
    words.select(col("word"), explode(seg(col("word"))).as("s"))
      .select(col("word"), col("s._1").as("start"), col("s._2").as("piece"))
  }

  /** One hard-EM round: E-step = [[viterbi]] under the current vocab's
    * [[scores]]; M-step = piece usage counts weighted by word
    * frequency; then the prune: single characters ALWAYS survive with
    * count usage+1 (the +1 smoothing keeps an unused character's count
    * positive so ln stays finite), multi-character pieces keep their
    * raw usage and only the top `vocabK` by (cnt desc, piece asc)
    * survive (a TakeOrdered — never a global sort). */
  def emRound(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      vocabK: Int): DataFrame = {
    val seg = viterbi(words, scores(vocab), maxPieceLen)
    val usage = seg.join(words.select("word", "wf"), "word")
      .groupBy("piece").agg(sum("wf").as("cnt"))
    val chars = words
      .select(explode(sequence(lit(0), length(col("word")) - 1)).as("i"),
        col("word"))
      .select(col("word").substr(col("i") + 1, lit(1)).as("piece"))
      .distinct()
    val singles = chars.join(usage, Seq("piece"), "left")
      .select(col("piece"), (coalesce(col("cnt"), lit(0L)) + 1L).as("cnt"))
    val multi = usage.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(vocabK)
    singles.unionByName(multi)
  }

  /** Learn a unigram-LM vocabulary: seed, then `rounds` hard-EM
    * rounds. @return (piece, cnt) — the tokenizer model. */
  def learn(docs: DataFrame, textCol: String, maxPieceLen: Int,
      minCount: Long, vocabK: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one EM round, got $rounds")
    val words = wordFreqs(docs, textCol).persist()
    var vocab = seedVocab(words, maxPieceLen, minCount)
    var r = 0
    while (r < rounds) {
      // each round's E-step collects the previous vocab (scores() is
      // evaluated inside viterbi's collect) — pin it so the lineage
      // does not chain EM rounds into one deep plan
      vocab = emRound(words, vocab, maxPieceLen, vocabK).localCheckpoint()
      r += 1
    }
    // the returned vocab is checkpointed (no lineage to words) — drop
    // the cache instead of pinning one block per learn() call forever
    words.unpersist(blocking = false)
    vocab
  }

  /** Tokenize the corpus' distinct words under a learned vocab:
    * (word, start, piece) — join back to documents by word for
    * document-level tokens (segmentation is a function of the word
    * alone, so the distinct-word table is the right unit). */
  def tokenize(docs: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int): DataFrame =
    viterbi(wordFreqs(docs, textCol), scores(vocab), maxPieceLen)
}
