package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Corpus-curation operators around dataset assembly: deterministic
  * train/val/test splits and greedy sequence packing. Both are
  * embarrassingly parallel by design — the split is a narrow per-row
  * hash, packing shuffles once and streams each group with O(1) state.
  */
object Curation {

  /** Deterministic hash split: assign each row a named split by bucketing
    * a salted content hash of its key — the reproducible alternative to
    * `sample()` that real pipelines use for held-out sets (stable under
    * reruns, re-partitioning, and incremental appends; changing the salt
    * re-rolls every assignment).
    *
    * Scale: a narrow projection — no shuffle, no state, no join; the
    * cross-engine md5 bucket ([[TextFunctions.portableHash60]] mod 10 000)
    * keeps assignments verifiable outside Spark.
    *
    * @param fractions (name, fraction) in order; fractions must sum to 1.
    * @return input plus `bucket` (0-9999) and `split` columns. */
  def hashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $fractions")
    require(fractions.forall(_._2 > 0),
      s"every split fraction must be positive, got $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"split names must be unique, got $fractions")
    // case-insensitive: withColumn resolves case-insensitively by default,
    // so a column named "Bucket" would otherwise be silently clobbered
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("bucket") || c.equalsIgnoreCase("split")),
      "input already has a bucket/split column — rename it first, " +
        "hashSplit appends its own")
    val bucket = saltedBucket(keyCol, salt)
    // cumulative upper bounds: [("train",.9),("val",.05),("test",.05)] ->
    // bucket<9000 train, <9500 val, else test
    val bounds = fractions.scanLeft(("", 0.0)) { case ((_, acc), (n, f)) =>
      (n, acc + f)
    }.tail
    val split = bounds.init.foldRight(lit(bounds.last._1)) {
      case ((name, ub), els) =>
        when(col("bucket") < math.round(ub * 10000).toInt, lit(name))
          .otherwise(els)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** The shared salted bucket: portable md5 hash of `key:salt`, mod
    * 10 000 — the determinism backbone of [[hashSplit]] and
    * [[hashSampleBy]]. */
  private def saltedBucket(keyCol: String, salt: String) =
    pmod(TextFunctions.portableHash60(
      concat(col(keyCol).cast("string"), lit(":"), lit(salt))), lit(10000))

  /** Deterministic stratified sampling — "data mixing": each stratum
    * (language, source, quality band …) keeps its own fraction of rows,
    * selected by the same salted-hash buckets as [[hashSplit]], so the
    * mix is reproducible under reruns, repartitioning, and incremental
    * appends, and a row's fate never depends on which executor saw it.
    * A narrow filter — no shuffle, no global counts; achieved rates are
    * hash-approximate (±bucket granularity), which is the price of
    * determinism without a count pass.
    *
    * @param rates stratum value → keep fraction in [0, 1], compiled to a
    *   literal map with O(1) lookup — thousands of strata (per-domain
    *   rates) are fine.
    * @param defaultRate keep fraction for strata absent from `rates`
    *   (also applies to a NULL stratum). */
  def hashSampleBy(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String,
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"keep rates must be in [0, 1], got $rates / default=$defaultRate")
    val rate =
      if (rates.isEmpty) lit(defaultRate)
      else coalesce(element_at(typedLit(rates), col(stratumCol)),
        lit(defaultRate))
    df.filter(saltedBucket(keyCol, salt) < rate * lit(10000.0))
  }

  /** Per-stratum state behind [[temperatureMix]]: counts, the 1e6-
    * quantized α-power `q_s = round(n_s^α · 10⁶)`, their integer totals
    * and the row budget. Quantizing the only float (the power) to an
    * integer makes every downstream quantity — totals, keep decisions —
    * exact integer arithmetic: sums are order-free and engines can't
    * drift. α = 0.5 uses `sqrt`, which IEEE-754 rounds exactly (bit-
    * identical across engines); other α use `pow` (libm may differ by
    * 1 ulp — absorbed by the 1e6 quantization except exactly at a
    * rounding boundary). */
  private def temperatureRates(df: DataFrame, stratumCol: String,
      alpha: Double, budgetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val p =
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha))
    val q = counts.withColumn("q_s", round(p * 1e6).cast("long"))
    val tot = q.agg(sum(col("q_s")).as("q_tot"),
      sum(col("n_docs")).as("n_tot"))
    q.crossJoin(broadcast(tot))
      .withColumn("budget",
        floor(lit(budgetFrac) * col("n_tot").cast("double")).cast("long"))
      .drop("n_tot")
  }

  /** The row-keep predicate: bucket/10⁴ < min(1, budget·w_s/n_s) with
    * w_s = q_s/q_tot, cross-multiplied into pure integers (decimal-
    * widened — no overflow at any corpus size, no float in the
    * decision). */
  private def temperatureKeep(bucket: Column): Column =
    bucket.cast("decimal(38,0)") * col("q_tot") * col("n_docs") <
      lit(10000).cast("decimal(38,0)") * col("budget") * col("q_s")

  /** Temperature-based mixture resampling — the standard LLM-corpus
    * mixing step: stratum s (source, language, domain …) is kept at a
    * rate proportional to `n_s^α / Σ_t n_t^α` of a global row budget,
    * flattening the natural distribution toward uniform as α → 0
    * (α = 1 reproduces it). Row selection reuses [[hashSplit]]'s
    * salted md5 bucket, so the subsample is deterministic under
    * reruns, repartitioning, and appends.
    *
    * Scale shape: one tiny per-stratum count aggregate broadcasts onto
    * a narrow filter of the corpus — the data itself never shuffles
    * (the [[hashSampleBy]] shape, with the rates computed instead of
    * given). Achieved counts are hash-approximate around
    * `budget · w_s` (exactly-k needs [[sampleKPerGroup]]'s heap).
    *
    * @param alpha      temperature in (0, 1]; 0.5 is the common choice
    * @param budgetFrac target fraction of ALL rows to keep, in (0, 1]
    * @return the sampled rows (input columns unchanged). */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
      alpha: Double, budgetFrac: Double, salt: String): DataFrame = {
    requireTemperatureArgs(df, alpha, budgetFrac)
    val rates = temperatureRates(df, stratumCol, alpha, budgetFrac)
    df.withColumn("__tm_bucket", saltedBucket(keyCol, salt))
      .join(broadcast(rates), col(stratumCol) === col("stratum"))
      .filter(temperatureKeep(col("__tm_bucket")))
      .drop("__tm_bucket", "stratum", "n_docs", "q_s", "q_tot", "budget")
  }

  /** The audit report for [[temperatureMix]]: one row per stratum with
    * its size, normalized temperature weight, effective keep rate, and
    * the achieved sample count (weight/rate are rounded DISPLAY values
    * — the keep decision never touches them).
    * @return (stratum, n_docs, weight, rate, n_sampled). */
  def temperatureMixReport(df: DataFrame, keyCol: String,
      stratumCol: String, alpha: Double, budgetFrac: Double,
      salt: String, scale: Int = 6): DataFrame = {
    requireTemperatureArgs(df, alpha, budgetFrac)
    val rates = temperatureRates(df, stratumCol, alpha, budgetFrac)
    df.select(col(stratumCol).as("stratum"),
        saltedBucket(keyCol, salt).as("bucket"))
      .join(broadcast(rates), "stratum")
      .groupBy("stratum", "n_docs", "q_s", "q_tot", "budget")
      .agg(sum(when(temperatureKeep(col("bucket")), 1L).otherwise(0L))
        .as("n_sampled"))
      .select(col("stratum"), col("n_docs"),
        round(col("q_s").cast("double") / col("q_tot").cast("double"),
          scale).as("weight"),
        round(least(lit(1.0),
          col("budget").cast("double") * col("q_s").cast("double") /
            (col("q_tot").cast("double") * col("n_docs").cast("double"))),
          scale).as("rate"),
        col("n_sampled"))
  }

  private def requireTemperatureArgs(df: DataFrame, alpha: Double,
      budgetFrac: Double): Unit = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0, 1], got $budgetFrac")
    val reserved = Seq("stratum", "n_docs", "q_s", "q_tot", "budget",
      "__tm_bucket", "bucket")
    val clash = df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with " +
        "temperatureMix internals — rename them first")
  }

  /** Deterministic exact-k per-group sample: the k rows of each group
    * with the smallest salted content hash — "give me a reproducible
    * audit sample of every stratum" without a sort.
    *
    * Scale: runs as a partial+final hash aggregate over the
    * [[graft.functions.TopKByScore]] heap — every row does one O(log k)
    * heap push on its input partition and only k-sized buffers cross
    * the shuffle. The window alternative (`row_number() ≤ k`) shuffles
    * and SORTS every row of every group; this never materializes more
    * than k candidates per group anywhere. Unlike [[hashSampleBy]]
    * (rate-based, count-free) the sample is exactly min(k, |group|)
    * rows, at the price of that one aggregate.
    *
    * The score is the first 13 hex chars (52 bits) of the salted md5 —
    * it fits a Double EXACTLY, so the heap's (score, id) order is
    * bit-identical to a SQL `ORDER BY hash_int, id` oracle.
    *
    * @param idCol long-castable unique row key (hashed, returned).
    * @return one row per kept (group, id). */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val score = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":"), lit(salt))),
      1, 13), 16, 10).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKByScore
        .topkMin(col(idCol).cast("long"), score, k).as("_picks"))
      .select(groupCols.map(col) :+ explode(col("_picks")).as("_p"): _*)
      .select(groupCols.map(col) :+ col("_p.id").as(idCol): _*)
  }

  /** Weighted reservoir sampling without replacement (Efraimidis &
    * Spirakis A-ES): per group, keep the k rows with the largest key
    * u^(1/w) — equivalently the k largest ln(u)/w — with u a
    * deterministic salted-hash uniform. The importance-weighted twin of
    * [[sampleKPerGroup]]: quality- or length-weighted corpus
    * subsampling where a row's inclusion probability scales with its
    * weight, still one bounded-heap aggregate (ONE shuffle, k rows of
    * state per group — no per-group sort at any scale).
    *
    * Cross-engine order contract: u = (h52 + 0.5)·2⁻⁵² from the first
    * 13 md5 hex chars (exact — both terms are powers of two), ln(u)
    * rounded to 9 decimals BEFORE the weight division so both engines
    * divide identical doubles (IEEE division is correctly rounded ⇒
    * identical quotients ⇒ identical order — the q169/q171 rounded-ln
    * discipline), ties broken by id. SQL twin: `ORDER BY
    * -(round(ln(u), 9) / CAST(w AS DOUBLE)), id` with `row_number() <=
    * k`.
    *
    * @param wCol positive integer weight column (rows with larger
    *   weight are proportionally more likely to be kept).
    * @return one row per kept (group, id). */
  def weightedSampleKPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, wCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val h52 = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":"), lit(salt))),
      1, 13), 16, 10).cast("long")
    val u = (h52.cast("double") + 0.5) / lit(4503599627370496.0)
    val score = -(round(log(u), 9) / col(wCol).cast("double"))
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKByScore
        .topkMin(col(idCol).cast("long"), score, k).as("_picks"))
      .select(groupCols.map(col) :+ explode(col("_picks")).as("_p"): _*)
      .select(groupCols.map(col) :+ col("_p.id").as(idCol): _*)
  }

  /** Scalar twin of [[weightedSampleKPerGroup]]'s A-ES key, for the
    * streaming reservoir's driver-free state updates
    * ([[graft.streaming.EventPipeline.weightedSampleStream]]): MUST
    * track the Column formulation bit-for-bit — md5 52-bit uniform,
    * StrictMath.log (what Spark's codegen'd `log` calls; `Math.log` is
    * an intrinsic that can differ by 1 ulp), `BigDecimal.valueOf`
    * HALF_UP rounding (what Spark's `round` does for doubles), one IEEE
    * division. Spec-enforced equal via the stream-vs-batch twin. */
  private[graft] def aesScore(id: Long, w: Long, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    val u = (h + 0.5) / 4503599627370496.0
    val lnu = java.math.BigDecimal.valueOf(StrictMath.log(u))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    -(lnu / w.toDouble)
  }

  /** Greedy sequence packing: group documents into fixed-token-budget
    * training sequences (first-fit in `idCol` order within each
    * `groupCol` shard) — the sample-packing step that turns a curated
    * corpus into dense context-window batches.
    *
    * Each group packs independently (the real pipeline shape: one packer
    * per shard), via ONE shuffle — repartition on the group key, sort
    * within partitions by (group, id), then a streaming scan with O(1)
    * state per partition (secondary-sort pattern; no per-group
    * collect, so a group larger than executor memory still packs).
    * Parallelism equals the number of groups — shard accordingly.
    *
    * Bin rule, mirrored exactly by the SQL oracle: the first doc of a
    * group opens bin 0; a doc whose tokens would push the running total
    * over `budget` opens a new bin (an oversized doc therefore gets a
    * bin of its own).
    *
    * @param tokCol BIGINT token count per doc.
    * @return (`groupCol`, `idCol`, `tokCol`, `seq_id`) — bin index within
    *   the group. */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
      tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val in = docs.select(col(groupCol), col(idCol), col(tokCol))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
    val outSchema = StructType(in.schema.fields :+
      StructField("seq_id", LongType, nullable = false))
    in.mapPartitions { it =>
      // partitions hold whole groups (hash-partitioned on groupCol),
      // sorted so each group is contiguous: reset state on group change
      var cur: Any = new AnyRef // sentinel unequal to any group value
      var acc = 0L
      var bin = 0L
      it.map { r =>
        val g = r.get(0)
        val n = r.getLong(2)
        if (g != cur) { cur = g; bin = 0L; acc = n }
        else if (acc + n > budget) { bin += 1; acc = n }
        else acc += n
        Row(r.get(0), r.get(1), n, bin)
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic negative sampling: for each row, `k` pseudo-random
    * "negative" partners drawn by hashing (id, j, salt) into the global
    * row index — the contrastive-pair generator of embedding-training
    * pipelines, reproducible under reruns and repartitioning (a row's
    * negatives depend only on its key, the draw index, and the corpus
    * size — never on execution order).
    *
    * Scale shape: the global index comes from [[GlobalIndex.rowNumbers]]
    * (two-pass partition-offset numbering — no single-partition window),
    * candidates are a narrow k-way explode, and the resolution is ONE
    * equi-join on the target position. Like rowNumbers itself, the call
    * is EAGER (a counting job fixes n and the numbering).
    *
    * A draw landing on the row itself shifts to the next position
    * (mod n) — still deterministic, never a self-pair (n must be ≥ 2).
    *
    * @param idCol unique key; sampled ids return in `neg_id`
    * @return (idCol, j, neg_id) — exactly k rows per input row. */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // persisted: idx feeds the count action AND both sides of the
    // resolution join — uncached, the sort+zipWithIndex stage would run
    // three times. Blocks release via ContextCleaner when the returned
    // plan is collected (the documented Dbscan.run lifecycle).
    val idx = GlobalIndex.rowNumbers(df.select(col(idCol)), Seq(idCol),
      outCol = "__pos").persist()
    val n = idx.count()
    require(n >= 2, s"need at least 2 rows to draw negatives, got $n")
    val h = pmod(TextFunctions.portableHash60(
      concat(col(idCol).cast("string"), lit("#"), col("j").cast("string"),
        lit(":"), lit(salt))), lit(n))
    val cands = idx
      .select(col(idCol), col("__pos"),
        explode(array((0 until k).map(lit): _*)).as("j"))
      .withColumn("__tgt",
        when(h + 1 === col("__pos"), pmod(h + 1, lit(n)) + 1)
          .otherwise(h + 1))
    cands.join(
        idx.select(col("__pos").as("__tgt"), col(idCol).as("neg_id")),
        "__tgt")
      .select(col(idCol), col("j"), col("neg_id"))
  }

  /** Deterministic systematic PPS sampling per stratum: walk each
    * group's rows in salted-hash order, drop `k` equally-spaced
    * boundaries on the cumulative-weight axis, and keep every row whose
    * weight span crosses a boundary — selection probability ∝ weight
    * ("probability proportional to size"), with exactly k picks per
    * group distributed over ≤ k distinct rows (a row heavier than the
    * stride absorbs several picks — its multiplicity returns in
    * `n_picks`). The weighted complement of [[sampleKPerGroup]] —
    * length-weighted corpus subsampling, spend-weighted account audits.
    *
    * Fully integer arithmetic: boundary j lands in row i iff
    * j·T < cum_i·k (T = group total), so the pick count below a
    * cumulative point c is ceil(c·k/T) — both engines evaluate the
    * same integer expressions, no floats anywhere. Deterministic under
    * reruns/repartitioning: the walk order is the portable salted md5
    * of the id (plus id tie-break), never execution order.
    *
    * Scale shape: one window shuffle partitioned by the STRATUM (the
    * cumulative and total sums share the same exchange+sort) — never a
    * global single-task window; shard accordingly, or pre-split giant
    * strata. Requires non-negative weights and cum·k within long range
    * (T·k < 2^63 — at a billion cent-weighted rows that bounds k
    * below ~10^6; quantize coarser if you need more).
    *
    * @param weightCol non-negative integral weight (cents pattern);
    *   zero-weight rows span no boundary and are never picked
    * @return (groupCols…, idCol, weight, n_picks ≥ 1) */
  def systematicSample(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: Column, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val h = TextFunctions.portableHash60(
      concat(col(idCol).cast("string"), lit(":"), lit(salt)))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    df.select((groupCols.map(col) :+ col(idCol) :+
        weightCol.cast("long").as("weight") :+ h.as("__h")): _*)
      .withColumn("cum", sum(col("weight")).over(wOrd))
      .withColumn("tot", sum(col("weight")).over(wAll))
      .filter(col("tot") > 0)
      .withColumn("n_picks",
        expr(s"(cum * $k + tot - 1) DIV tot" +
          s" - ((cum - weight) * $k + tot - 1) DIV tot"))
      .filter(col("n_picks") > 0)
      .select((groupCols.map(col) :+ col(idCol) :+ col("weight") :+
        col("n_picks")): _*)
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its hashed n-gram
    * profile is under the TARGET distribution (rows where `targetFlag`)
    * than under the RAW corpus distribution. Per hash bucket b with
    * add-one smoothing,
    *   λ(b) = log₂((tgt_b+1)/(N_t+B)) − log₂((raw_b+1)/(N_r+B)),
    * and a document's log importance weight is Σ_b c_d(b)·λ(b) over its
    * own bucket counts — the feature-hashing trick collapses the open
    * n-gram vocabulary to B fixed buckets, which is what makes the
    * estimator one broadcast join at any corpus size.
    *
    * Order-safe transcendentals (the q139/mutualInfo discipline): λ is a
    * single fixed-order double off exact integer counts (products widened
    * to decimal first), each doc term c·λ is rounded to 9 decimals and
    * summed as decimal(38,9) — exact, commutative, partitioning-proof.
    *
    * Scale shape (100 TB): the gram explode is narrow; ONE hash
    * aggregate builds the (doc, bucket) count table, which is re-used
    * for the B-row global bucket profile (second agg over far fewer
    * rows) and the closing per-doc sum; the bucket profile and λ table
    * broadcast (B rows). The corpus text is never shuffled — only
    * (doc, bucket) pairs, bounded by docs × min(B, doc grams).
    *
    * Portable hashing: buckets come from the md5-based
    * [[TextFunctions.portableHash60]] mod B so an external SQL engine
    * reproduces the assignment bit-for-bit.
    *
    * @param targetFlag boolean column over `docs` selecting the target
    *   domain (e.g. `col("lang") === "en"`)
    * @return (`idCol`, n_grams, logw_bits) — positive logw_bits ⇒ doc
    *   looks more target-like; resample ∝ exp(logw) downstream. Docs
    *   shorter than `n` words have no grams and drop out. */
  def dsirImportance(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, n: Int, buckets: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // persisted: the (doc, bucket) counts feed BOTH the corpus bucket
    // profile and the final per-doc weight sum — uncached, the full-text
    // gram explode would run twice (ContextCleaner lifecycle, as in
    // negativeSample)
    val docBuckets = docs
      .select(col(idCol).as("id"), targetFlag.cast("int").as("flag"),
        explode(TextFunctions.shinglesAll(col(textCol), n)).as("gram"))
      .groupBy(col("id"), col("flag"),
        pmod(TextFunctions.portableHash60(col("gram")), lit(buckets))
          .as("bkt"))
      .agg(count(lit(1)).as("c"))
      .persist()
    // persisted: bucketStats appears in BOTH λ's subtree and totals' —
    // uncached, the full (doc, bucket) aggregate would run twice
    val bucketStats = docBuckets.groupBy("bkt")
      .agg(sum(col("c")).as("raw"),
        sum(col("c") * col("flag")).as("tgt"))
      .persist()
    val totals = bucketStats
      .agg(sum(col("raw")).as("nr"), sum(col("tgt")).as("nt"))
    val lam = bucketStats.crossJoin(broadcast(totals))
      .select(col("bkt"), log2(
        ((col("tgt") + 1).cast("decimal(38,0)") * (col("nr") + buckets))
          .cast("double") /
        ((col("raw") + 1).cast("decimal(38,0)") * (col("nt") + buckets))
          .cast("double")).as("lam"))
    docBuckets.join(broadcast(lam), "bkt")
      .groupBy(col("id").as(idCol))
      .agg(sum(col("c")).cast("long").as("n_grams"),
        sum(round(col("c").cast("double") * col("lam"), 9)
          .cast("decimal(38,9)")).as("__w"))
      .withColumn("logw_bits", round(col("__w").cast("double"), 6))
      .drop("__w")
  }

  /** Embedding-level eval-set contamination screen — the semantic
    * complement of the n-gram decontamination (q36): a held-out example
    * is contaminated when ANY training vector sits within cosine τ
    * (paraphrases and near-copies that share no n-grams). Per flagged
    * held-out row: the hit count and the top-cosine training neighbor
    * (ties by id — the AnnSearch ordering).
    *
    * Scale shape — SIZE-DISPATCHED (the fused/distributed idiom):
    * below `bruteForceThreshold` held-out rows, the exact brute-force
    * pair stream runs (an eval set is usually small; this is the
    * DuckDB-oracled path, unchanged). Above it, candidates come from
    * [[AnnSearch.lshCandidatePairs]] — the (table, bucket) EQUI-join,
    * so the |H|·|T| cross scan never exists — and the identical τ
    * filter + aggregate runs over them. The big path is APPROXIMATE in
    * the standard LSH sense: a contaminated pair is missed only if it
    * collides in no table, and τ-level cosines (near-copies) collide
    * with high probability per table — recall is spec-measured; what
    * IS reported is exact (same cosine, same tie rules). Either way
    * the τ filter prunes before the bounded top-1 heap.
    *
    * @param heldout (idCol, vecCol) eval rows; @param train likewise.
    * @param bruteForceThreshold held-out row count (one count() probe)
    *   above which the LSH candidate path replaces brute force under
    *   `route = "auto"`. The switch is SILENT in the results (the
    *   schema is identical; only τ-level hits that collide in no LSH
    *   table go missing) — so the chosen path is logged at INFO, and
    *   callers who need guaranteed exactness at any size should pass
    *   `route = "exact"` (or a screen that must scale regardless of
    *   the eval set's size, `route = "lsh"`) instead of relying on the
    *   size dispatch
    * @param route "auto" (size dispatch, default), "exact" (force the
    *   brute-force pair stream), or "lsh" (force the candidate join)
    * @param lshTables/@param lshBits/@param seed the big path's
    *   [[AnnSearch.srpPlanes]] geometry
    * @return (idCol, n_hits, top_train_id, top_cos) — flagged rows only. */
  def embeddingContamination(heldout: DataFrame, train: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      bruteForceThreshold: Long = 100000L, lshTables: Int = 8,
      lshBits: Int = 12, seed: Long = 42L,
      route: String = "auto"): DataFrame = {
    import graft.functions.{TopKByScore, VectorExpressions}
    require(Set("auto", "exact", "lsh")(route),
      s"route must be auto/exact/lsh, got '$route'")
    def norm(df: DataFrame, id: String, v: String, n: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v))
        .withColumn(n, VectorExpressions.dotProduct(col(v), col(v)))
    val cos = VectorExpressions.dotProduct(col("a_v"), col("b_v")) /
      sqrt(col("a_n") * col("b_n"))
    // routing probe: ONE count() over the held-out side (eval sets are
    // small and this operator is a screen, not a hot loop; callers
    // with an expensive derived held-out plan should cache it — the
    // probe and the pair scan each evaluate it once). Explicit routes
    // skip the probe entirely.
    val exact = route match {
      case "exact" => true
      case "lsh" => false
      case _ =>
        val n = heldout.count()
        val brute = n <= bruteForceThreshold
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"embeddingContamination auto-route: ${if (brute) "exact "
            else "APPROXIMATE lsh "}path (heldout=$n, " +
            s"threshold=$bruteForceThreshold); pass route=\"exact\" " +
            "to force the brute-force screen")
        brute
    }
    val scored =
      if (exact)
        norm(heldout.repartition(col(idCol)), "a_id", "a_v", "a_n")
          .join(norm(train, "b_id", "b_v", "b_n"), lit(true))
          .select(col("a_id"), col("b_id"), cos.as("cos"))
      else {
        val dims = graft.functions.VectorOps.probeDim(heldout, vecCol)
          .getOrElse(throw new IllegalArgumentException(
            s"cannot probe $vecCol's dimensionality (empty held-out?)"))
        // lshCandidatePairs scores with the identical hoisted-norm
        // cosine expression before its dedup
        AnnSearch.lshCandidatePairs(
          heldout.select(col(idCol).as("a_id"), col(vecCol).as("a_v")),
          train.select(col(idCol).as("b_id"), col(vecCol).as("b_v")),
          AnnSearch.srpPlanes(lshTables, lshBits, dims, seed))
      }
    scored
      .filter(col("cos") >= tau)
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_hits"),
        TopKByScore.topkMin(col("b_id"), -col("cos"), 1).as("top"))
      .select(col("a_id").as(idCol), col("n_hits"),
        col("top").getItem(0).getField("id").as("top_train_id"),
        round(-col("top").getItem(0).getField("score"), 6).as("top_cos"))
  }

  /** SFT transcript assembly — the post-training data-prep step:
    * ordered conversation turns become one transcript per conversation
    * (`<role>\n` header + turn text + `\n` per block, concatenated in
    * `ordCol` order) plus the LOSS-MASK spans: the 1-based character
    * range of every `assistantRole` turn's TEXT inside the transcript
    * (fine-tuning losses apply to assistant tokens only; headers and
    * non-assistant turns are context). Span arithmetic is exact
    * integers off one cumulative-length window — the invariant
    * `substring(transcript, span_start, span_len) == turn text` is
    * spec-pinned.
    *
    * Scale shape: ONE exchange on hash(conv) — the window and both
    * closing aggregates reuse it. `ordCol` must be unique per
    * conversation; NULL texts count as empty turns.
    *
    * @return one row per ASSISTANT turn: (`convCol`, n_turns, n_chars,
    *   transcript_md5, span_start, span_len); conversations with no
    *   assistant turn are absent (nothing to mask). */
  def sftTranscripts(turns: DataFrame, convCol: String, ordCol: String,
      roleCol: String, textCol: String,
      assistantRole: String = "assistant"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = turns.select(col(convCol).as("conv"), col(ordCol).as("ord"),
        col(roleCol).as("role"),
        coalesce(col(textCol), lit("")).as("txt"))
      .select(col("conv"), col("ord"), col("role"), col("txt"),
        concat(lit("<"), col("role"), lit(">\n"), col("txt"), lit("\n"))
          .as("blk"))
    val w = Window.partitionBy("conv").orderBy("ord")
    val withOff = t.withColumn("end_off",
      sum(length(col("blk")).cast("long")).over(w))
    val spans = withOff.filter(col("role") === assistantRole)
      .select(col("conv"),
        // block starts at end_off − len(blk) + 1; the text starts after
        // the "<role>\n" header (len(role) + 3 chars)
        (col("end_off") - length(col("blk")) + 1 + length(col("role")) + 3)
          .as("span_start"),
        length(col("txt")).cast("long").as("span_len"))
    val transcripts = withOff.groupBy("conv")
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col("ord"), col("blk")))),
          x => x("blk")), "").as("transcript"))
    spans.join(transcripts, "conv")
      .select(col("conv").as(convCol), col("n_turns"),
        length(col("transcript")).cast("long").as("n_chars"),
        md5(col("transcript").cast("binary")).as("transcript_md5"),
        col("span_start"), col("span_len"))
  }

  /** Preference-pair assembly — the DPO/RLHF-data primitive: per group
    * (a prompt and its scored candidate responses), pair the `nTop`
    * best candidates against the `nBottom` worst, keeping pairs whose
    * score margin is at least `minMargin`. The margin floor is the
    * labeling-noise guard (a chosen/rejected pair with near-equal
    * reward teaches the preference model nothing but noise).
    *
    * Scale shape: ONE hash aggregate carrying two bounded heaps per
    * group (best by −score, worst by +score — partial map-side, only
    * (nTop + nBottom)-sized buffers cross the shuffle), then a bounded
    * nTop×nBottom explode. Never an all-pairs join within a group; a
    * group with millions of candidates still emits ≤ nTop·nBottom
    * rows. Ties break by candidate id on both heaps, so the pair set
    * is deterministic and SQL-reproducible.
    *
    * Numerics: pass an INTEGRAL score (quantize rewards first — the
    * [[graft.operators.Stats.auc]] contract): heap scores are doubles,
    * exact below 2^53, and the emitted margin is an exact integer.
    *
    * @param scoreCol integral score (higher = preferred)
    * @param minMargin strict-preference floor, must be ≥ 1: at 0 (or
    *   below) two tied candidates would emit BOTH orientations —
    *   (x chosen, y rejected) and (y chosen, x rejected) — i.e.
    *   contradictory preference pairs, defeating the noise guard
    * @return (`groupCol`, chosen_id, rejected_id, margin) —
    *   margin = score(chosen) − score(rejected) ≥ minMargin, and the
    *   same candidate never appears on both sides of one pair. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, nTop: Int, nBottom: Int,
      minMargin: Long): DataFrame = {
    require(nTop >= 1 && nBottom >= 1,
      s"need positive heap sizes, got nTop=$nTop nBottom=$nBottom")
    require(minMargin >= 1L,
      s"minMargin must be >= 1 (strict preference), got $minMargin: " +
        "at 0 tied candidates emit both contradictory orientations")
    val heaps = df
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        scoreCol.cast("double").as("s"))
      .filter(col("s").isNotNull)
      .groupBy("grp")
      .agg(
        graft.functions.TopKByScore.topkMin(col("id"), -col("s"), nTop)
          .as("best"),
        graft.functions.TopKByScore.topkMin(col("id"), col("s"), nBottom)
          .as("worst"))
    heaps
      .select(col("grp"), explode(col("best")).as("c"), col("worst"))
      .select(col("grp"), col("c.id").as("chosen_id"),
        (-col("c.score")).as("cs"), explode(col("worst")).as("r"))
      .select(col("grp").as(groupCol), col("chosen_id"),
        col("r.id").as("rejected_id"),
        (col("cs") - col("r.score")).cast("long").as("margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
  }
}
