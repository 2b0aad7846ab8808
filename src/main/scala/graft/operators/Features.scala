package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time feature snapshot — the feature-store primitive: per
  * entity, trailing-window activity features as of a fixed cutoff
  * instant, using ONLY events strictly before the cutoff (the
  * leakage-free construction for training labels dated at the cutoff).
  *
  * One conditional-aggregate pass: every (window × metric) feature is a
  * `sum(when(ts >= cutoff - len, …))` over the same grouped scan — no
  * per-window scans, no joins, one shuffle on the entity key. Integer
  * numerics throughout (counts, cent sums, recency in ms), so results
  * are order- and partition-independent.
  */
object Features {

  /** @param df       event log
    * @param keyCol   entity key (one output row per key with ≥1 event
    *                 before the cutoff)
    * @param tsCol    event instant, same unit as `cutoff` (ms)
    * @param cutoff   snapshot instant; only `ts < cutoff` events count
    * @param windows  (name, length) trailing windows ending at the
    *                 cutoff: events with `ts >= cutoff - length`
    * @param valCents integer-cents value expression to sum per window
    * @return (key, recency, n_life, v_life_cents,
    *          n_<name>, v_<name>_cents per window) — `recency` =
    *   cutoff − last event ts. */
  def snapshot(df: DataFrame, keyCol: String, tsCol: String, cutoff: Long,
      windows: Seq[(String, Long)], valCents: Column): DataFrame = {
    require(windows.nonEmpty, "need at least one trailing window")
    require(windows.forall(_._2 > 0), s"window lengths must be positive")
    require(windows.map(_._1).distinct.size == windows.size,
      s"window names must be unique, got ${windows.map(_._1)}")
    val in = df.filter(col(tsCol) < cutoff)
      .select(col(keyCol), col(tsCol).as("__ts"),
        valCents.cast("long").as("__v"))
    val winAggs = windows.flatMap { case (name, len) =>
      val hit = col("__ts") >= cutoff - len
      Seq(
        sum(when(hit, 1L).otherwise(0L)).as(s"n_$name"),
        sum(when(hit, col("__v")).otherwise(0L)).as(s"v_${name}_cents"))
    }
    val aggs = Seq(
      (lit(cutoff) - max(col("__ts"))).as("recency"),
      count(lit(1)).as("n_life"),
      sum(col("__v")).as("v_life_cents")) ++ winAggs
    in.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Smoothed target (mean) encoding of a categorical column — the
    * high-cardinality feature-engineering standard:
    * enc_c = (Σy_c + m·μ) / (n_c + m), shrinking rare categories
    * toward the global mean μ (m = the pseudo-count prior; m = 0 is
    * the raw category mean, ∞ the global mean).
    *
    * Exactness: per-category (n, Σy) and the global totals accumulate
    * as exact integers (decimal-widened sums); μ is ONE double
    * division and the encoding one fixed-order expression over it —
    * round(6) reproduces cross-engine. ONE hash aggregate over the
    * rows; the global scalars attach by broadcast cross join
    * (the woeIv shape).
    *
    * Training-hygiene note: encode on the TRAINING split and join onto
    * eval — this operator computes the encoding table, the split is
    * the caller's (hashSplit) job.
    *
    * @param targetInt integer-valued target (e.g. cents, or a 0/1)
    * @param m smoothing pseudo-count (≥ 0)
    * @return (category, n, enc) — one row per observed category. */
  def targetEncode(df: DataFrame, catCol: Column, targetInt: Column,
      m: Double): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val cats = df.select(catCol.as("category"),
        targetInt.cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast("decimal(38,0)")).as("__sy"))
    val tot = cats.agg(sum(col("n")).as("__tn"), sum(col("__sy")).as("__ts"))
    val mu = col("__ts").cast("double") / col("__tn").cast("double")
    cats.crossJoin(broadcast(tot))
      .select(col("category"), col("n"),
        round((col("__sy").cast("double") + lit(m) * mu) /
          (col("n").cast("double") + lit(m)), 6).as("enc"))
  }

  /** Per-vector symmetric int8 quantization report over an embedding
    * column — code sums and the 1e-12-unit reconstruction error, all
    * exact integers (see [[graft.functions.Int8QuantStats]] for the
    * quantizer's defined arithmetic). ONE projection + nothing else: no
    * join for the per-vector max, no explode of the element stream —
    * the only shape that scans a 100 TB embedding store once at memory
    * bandwidth. The 4-byte→1-byte storage trade this audits is the
    * lightweight cousin of [[AnnSearch.pqEncode]]. Unquantizable
    * vectors — empty, or carrying a NULL element — are excluded (one
    * row per QUANTIZABLE vector under any input).
    * @return (vec_id, n_dims, sum_q, sum_absq, err_q12). */
  def int8QuantReport(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"),
        graft.functions.VectorExpressions.int8QuantStats(col(vecCol))
          .as("__s"))
      // the kernel nulls NULL-element vectors; n_dims = 0 is empty —
      // both excluded, and the oracle mirrors the exclusion
      .filter(col("__s").isNotNull && element_at(col("__s"), 1) > 0)
      .select(col("vec_id"),
        element_at(col("__s"), 1).as("n_dims"),
        element_at(col("__s"), 2).as("sum_q"),
        element_at(col("__s"), 3).as("sum_absq"),
        element_at(col("__s"), 4).as("err_q12"))

  /** Quantile normalization onto the POOLED distribution — the
    * batch-effect remover (Bolstad et al. 2003's microarray classic,
    * the same move that aligns feature distributions across corpus
    * sources): each value is replaced by the pooled order statistic at
    * its within-group rank position,
    *
    *   qn(row) = pooled value at global rank ⌈r·N/n⌉
    *
    * (r = rank within group, n = group size, N = pool size — exact
    * integer arithmetic, so the mapping is engine-identical; unequal
    * group sizes are handled by the ceiling map rather than classic
    * QN's equal-size assumption). Ties order by (value, group, id) —
    * a total order both engines reproduce.
    *
    * Scale shape: the pooled ranking is [[GlobalIndex.rowNumbers]]'s
    * range-partitioned zipWithIndex (never a one-task global window);
    * within-group ranks are per-group window partitions; the closing
    * equi-join on the computed global rank is an ordinary shuffle
    * join. N is one count (a scalar, the q94 precedent).
    *
    * @param valCol integral (pre-quantized) values
    * @return (grp, id, v, qn). */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      valCol.cast("long").as("v")).persist()
    val nTotal = base.count()
    val pool = GlobalIndex.rowNumbers(base, Seq("v", "grp", "id"), "gidx")
      .select(col("gidx"), col("v").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    val ranked = base
      .withColumn("__r", row_number().over(w.orderBy(col("v"), col("id"))))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("gidx",
        expr(s"(__r * ${nTotal}L + __n - 1L) DIV __n"))
    ranked.join(pool, "gidx")
      .select(col("grp"), col("id"), col("v"), col("qn"))
  }


  /** Mean-pool chunk embeddings into one vector per parent — how a long
    * document gets ONE embedding from its chunks' (the q40 chunking
    * step's dual; pooled doc vectors then feed dedup/ANN/clustering).
    * Exact arithmetic: components quantize to round(v·1e6) longs, the
    * per-dimension sum is an exact INTEGER aggregate — a raw double sum
    * would drift with partitioning/shuffle order — closed by two fixed
    * double divisions (the Lloyd-mean discipline), so the pooled value
    * is bit-reproducible in any engine.
    *
    * Scale shape: one position explode + one (grp, pos) hash aggregate
    * — partial map-side, dims·|rows| narrow rows through a single
    * exchange. Output exploded per dimension (scalar columns — parquet
    * and oracle friendly, like jlProject's).
    *
    * @return (grp, pos 0-based, pooled UNROUNDED, n_chunks). */
  def meanPoolEmbeddings(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("grp", "pos")
      .agg(
        (sum(round(col("v") * 1e6).cast("long")).cast("double")
          / count(lit(1)).cast("double") / lit(1e6)).as("pooled"),
        count(lit(1)).as("n_chunks"))
}
