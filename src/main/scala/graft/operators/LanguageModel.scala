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
}
