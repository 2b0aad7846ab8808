package graft

/** Sanity guards for the bench's in-engine synthetic workloads — they
  * run per-round as scale diagnostics, so a silent semantic break
  * (empty pipeline stage, budget violation) would quietly turn a
  * scale-evidence number into a no-op measurement. */
class WorkloadsSpec extends SparkSpec {

  test("curationSynth composition: survivors < docs, splits, budget, " +
      "SFT tail non-empty") {
    val out = Workloads.curationSynth(spark, 2000L).collect()
    val shards = out.map(_.getString(0)).toSet
    // both splits must survive the dedup + quality gate at this n, and
    // the post-training tail must actually assemble transcripts (an
    // empty turn table would silently drop the sft_train row)
    assert(shards == Set("train", "val", "sft_train"), s"shards: $shards")
    val byShard = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val nDocs = byShard("train")._1 + byShard("val")._1
    // near-dup survivors strictly below the input (templates repeat)
    assert(nDocs > 0 && nDocs < 2000, s"survivors: $nDocs")
    // packing: sequences exist and average fill respects the budget
    Seq("train" -> 512L, "val" -> 512L, "sft_train" -> 8192L).foreach {
      case (sh, budget) =>
        val (docs, seqs, toks) = byShard(sh)
        assert(seqs >= 1 && seqs <= docs, s"$sh: $seqs seqs / $docs")
        assert(toks <= seqs * budget,
          s"$sh packing exceeded budget: $toks tokens in $seqs seqs")
    }
    // transcripts cover the train docs: conv count is ~train/60,
    // total transcript chars exceed the raw text (role headers add)
    assert(byShard("sft_train")._1 >= 1 &&
      byShard("sft_train")._3 > byShard("train")._1 * 60,
      s"sft tail too small: ${byShard("sft_train")}")
  }

  test("textStatsSynth: bands partition the corpus, token totals add up") {
    val out = Workloads.textStatsSynth(spark, 3000L).collect()
    val docs = out.map(_.getLong(1)).sum
    assert(docs == 3000L, s"band histogram lost docs: $docs")
    // 60 tokens per synthetic doc
    assert(out.map(_.getLong(2)).sum == 3000L * 60)
    // ttr bands are multiples of 10 in [0, 100]
    assert(out.forall { r =>
      val b = r.getLong(0); b % 10 == 0 && b >= 0 && b <= 100
    })
  }

  test("kdEpsSynth: pair counts match the grid-path eps-join exactly") {
    import org.apache.spark.sql.functions._
    val n = 5000L
    val viaKd = Workloads.kdEpsSynth(spark, n, eps = 0.2)
      // coalesce: an empty pair stream must read as 0, not NPE on
      // sum's NULL, so the informative asserts below still fire
      .agg(coalesce(sum(col("pairs")), lit(0L))).head.getLong(0)
    // independent truth: the grid path (selfJoin) on the same vectors —
    // different index, identical pair-set semantics
    val viaGrid = graft.operators.EpsilonJoin
      .selfJoin(Workloads.synthEmbeddings(spark, n, 32, 64),
        "vec_id", "embedding", 0.2, bucketDims = Seq(0, 1, 2)).count()
    assert(viaKd == viaGrid, s"kd=$viaKd grid=$viaGrid")
    assert(viaKd > 0, "eps=0.2 should capture within-blob pairs")
  }

  test("annSynth returns k ranked neighbors per sampled query") {
    val out = Workloads.annSynth(spark, 20_000L, nCentroids = 16,
      nProbe = 4)
    val got = out.collect()
    val perQuery = got.groupBy(_.getLong(0))
    assert(perQuery.size == 20) // one query per 1000 vectors
    perQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 10))
    }
  }

  test("substrSynth: anchored span histogram is sane on the mixed " +
      "corpus — spans exist, every band is >= L, totals consistent, " +
      "and only the boilerplate tail carries spans") {
    val rows = graft.Workloads.substrSynth(spark, 2000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "boilerplate tail produced no duplicated spans")
    // span_len >= L by construction => len_band = span_len / 40 >= 1
    assert(rows.forall(_._1 >= 1L), s"band below L: ${rows.toSeq}")
    assert(rows.forall(t => t._2 > 0 && t._3 > 0 && t._4 >= 40 * t._2),
      s"inconsistent band stats: ${rows.toSeq}")
    // 5% boilerplate at n=2000 -> 100 dup docs in ~10-copy template
    // groups; most carry a span, and the 95% unique head carries NONE
    // (spanned docs bounded by the dup tail)
    // (a doc can appear in several bands — bound is dup docs × bands)
    val nDocs = rows.map(_._3).sum
    assert(nDocs >= 80, s"suspiciously few spanned docs: $nDocs")
    assert(nDocs <= 100L * rows.length,
      s"unique head produced spans: $nDocs docs over ${rows.length} bands")
  }
}
