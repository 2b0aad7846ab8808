package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-gradient logistic regression — the trained linear quality
  * classifier of the curation family (fastText-style surface-statistics
  * scoring: fit on a labeled slice, score the whole corpus). Completes
  * the supervised trio next to the generative Naive Bayes
  * ([[LanguageModel.naiveBayesFit]]) and the OLS slope (q78): a
  * discriminative model whose weights are trained by iterated descent,
  * the shape every learned quality/langid filter in a data pipeline
  * takes.
  *
  * Training loop (fixed step count, full batch):
  *   w ← w − lr · (1/n) Σᵢ (σ(w·xᵢ) − yᵢ) · xᵢ,  σ(z) = 1/(1+e^(−z))
  *
  * Numerics — bit-identical across partitionings AND engines (the q139
  * order-safe-transcendental discipline): each row's gradient term
  * folds left-to-right in double over deterministic feature values,
  * rounds to 9 decimals, and sums as decimal(38,9) — an EXACT,
  * order-free aggregate. The weight update itself is a handful of
  * driver-side IEEE doubles computed from those exact sums, so an
  * unrolled SQL twin reproduces the weights digit-for-digit.
  *
  * Scale shape (100 TB): one linear aggregate pass per iteration over a
  * cached projection; the weights travel INTO the plan as literals
  * (folded into codegen — no broadcast table, no corpus shuffle,
  * nothing driver-side but a p-vector). iters × scan is the whole
  * bill; the aggregate is a partial-merge decimal sum, so map-side
  * combine does the heavy lifting.
  */
object Logistic {

  /** Sum-type for one fitted model: bias first, then one weight per
    * feature column, in the order given to [[fit]]. */
  type Weights = Array[Double]

  /** σ(bias + Σ xⱼ·wⱼ) as a fixed-order column fold — the scoring
    * expression; identical parenthesization to the training fold and
    * to the SQL twin (left-assoc `+`). */
  def sigmoid(features: Seq[Column], w: Weights): Column = {
    require(w.length == features.size + 1,
      s"need ${features.size + 1} weights (bias first), got ${w.length}")
    val z = features.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + f.cast("double") * lit(w(j + 1))
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Fit by `iters` full-batch gradient steps from w = 0. `label` must
    * be 0/1; `features` must be DETERMINISTIC per-row expressions
    * (integer-derived ratios/scales — anything whose double value no
    * engine can disagree on). Returns the final weights, bias first.
    *
    * One aggregate job per iteration (n rides along in the first), on
    * a persisted narrow projection released before returning. */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
      lr: Double, iters: Int): Weights = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val p = features.size + 1
    val proj = df.select(
      (label.cast("double").as("__y") +:
        features.zipWithIndex.map { case (f, j) =>
          f.cast("double").as(s"__x$j")
        }): _*).persist()
    try {
      var w: Weights = Array.fill(p)(0.0)
      var n = -1L
      for (_ <- 0 until iters) {
        val err = sigmoid(
          (0 until p - 1).map(j => col(s"__x$j")), w) - col("__y")
        val aggs = (0 until p).map { j =>
          val term = if (j == 0) err else err * col(s"__x${j - 1}")
          sum(round(term, 9).cast("decimal(38,9)")).as(s"__g$j")
        } :+ count(lit(1)).as("__n")
        val row = ConnectedComponents.withJobDesc(proj,
          "logistic: gradient pass") {
          proj.agg(aggs.head, aggs.tail: _*).first()
        }
        if (n < 0) n = row.getLong(p)
        require(n > 0, "empty input: nothing to fit")
        val next = new Array[Double](p)
        var j = 0
        while (j < p) {
          // exact decimal → nearest double, then IEEE ops — both
          // engine-reproducible
          next(j) = w(j) -
            lr * (row.getDecimal(j).doubleValue() / n.toDouble)
          j += 1
        }
        w = next
      }
      w
    } finally proj.unpersist()
  }

  /** Fit on `df` then score it: appends `round(σ(w·x), 6)` as
    * `probCol`. Training and scoring scan the same cached projection
    * world — callers wanting train/apply splits call [[fit]] and
    * [[sigmoid]] directly. */
  def fitScore(df: DataFrame, features: Seq[Column], label: Column,
      lr: Double, iters: Int, probCol: String = "prob"): DataFrame = {
    val w = fit(df, features, label, lr, iters)
    df.withColumn(probCol, round(sigmoid(features, w), 6))
  }
}
