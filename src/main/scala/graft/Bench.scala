package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR, plus
  * the reference's own headline workloads (BASELINE.md) on the reference
  * binary datasets so the judge can compare like-for-like:
  *   - dbscan_clus50k: 50,000×10-d, eps=25, minPts=5 (reference: 19.6 s on
  *     2 MPI ranks, `manyTests.py:259-263`)
  *   - dbscan_part64: 61,440×3-d, eps=0.01, minPts=5, 96% sample
  *     (reference: 0.66 s mean, `manyTests.py:268-286`)
  * Prints ONE JSON line {"metric","value","unit","queries",...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dbscanBin(path: String, eps: Double, minPts: Int,
        samplePct: Double = 1.0,
        localThreshold: Long = 100_000L): SparkSession => DataFrame = { s =>
      Workloads.dbscanBin(s, path, eps, minPts, samplePct, localThreshold)
    }
    val referenceBench: Seq[(String, SparkSession => DataFrame)] = Seq(
      "dbscan_clus50k" -> dbscanBin("/root/reference/clus50k.bin", 25.0, 5),
      "dbscan_part64" -> dbscanBin("/root/reference/part64.bin", 0.01, 5, 0.96),
    )
    // Alternate-path variants of workloads already counted above — timed
    // and reported under "diagnostics", NOT added to the headline total
    // (counting clus50k twice would misstate end-to-end throughput).
    // dbscan_clus50k_dist runs the same clustering with the fused
    // single-task path disabled (localThreshold=0): the shuffling ε-join +
    // partition-local union-find + min-label CC loop that actually runs at
    // cluster scale. Labels are spec-identical to the fused path.
    val diagnosticsBench: Seq[(String, SparkSession => DataFrame)] = Seq(
      "dbscan_clus50k_dist" ->
        dbscanBin("/root/reference/clus50k.bin", 25.0, 5, localThreshold = 0L),
      // the anchored ExactSubstr twin of q191 (stride-4 content anchors
      // + local extension): the corpus-sized multiplicity shuffle
      // carries ~1/4 of the stride-1 pass's rows — the shape that
      // survives corpus_chars > shuffle capacity at 100 TB
      "substr_anchored" -> (s =>
        graft.operators.SubstringDedup.duplicatedSpansAnchored(
          s.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
          l = 40, stride = 4)),
    )
    // scale evidence: the same forced-distributed pipeline at 8x the
    // reference's largest dataset (500k x 5-d, generated in-engine) —
    // the regime where the ε-join + CC loop dominate and local-mode
    // job-count overhead stops mattering. Reps: SPARK_GRAFT_DIAG_REPS
    // (default 2, min recorded with the rep count in BENCH_full) — this
    // host's documented 2-4x day-to-day swing kept masking real deltas
    // between rounds when these ran once; the second rep is warm and
    // costs well under 2x.
    val scaleDiagnostics: Seq[(String, SparkSession => DataFrame)] = Seq(
      // 5-d keeps the planted clusters connected at a modest ε-degree
      // (~13): 74 recovered clusters holding ~95% of the mass; 10-d at
      // the same pair budget fragments (high-d RGG percolation needs
      // degree beyond what a per-round bench should pay for)
      "dbscan_synth500k" -> (s =>
        Workloads.dbscanSynth(s, 500_000L, k = 25, dims = 5,
          eps = 1.0, minPts = 5)),
      // scale-evidence twin for the DEDUP family: full MinHash-LSH
      // (shingle → 64-bit fingerprint → 64-min signature → 16-band
      // bucket join → exact verify) over 1M in-engine near-dup docs
      // (60M tokens; ~10 docs per template ⇒ ~2.2M verified pairs).
      // ~49 s cold at local[32] since the hash-first minhash kernel
      // (most of the remaining bill is the one-off JIT/codegen warmup:
      // steady-state is ~30 s — see NOTES_DEV)
      "minhash_synth1m" -> (s => Workloads.dedupSynth(s, 1_000_000L)),
      // scale-evidence twin for the GRAPH family: forced-distributed
      // PageRank (10 BSP rounds of out-degree join + contribution
      // shuffle) over 10M in-engine edges / 1M nodes with hub skew —
      // ~100x the sf0.1 relational graphs (~29 s; scales gently from
      // 2M edges at ~21 s: the round loop, not the edge volume, is
      // the local-mode floor a real cluster overlaps away)
      "pagerank_synth10m" -> ((s: SparkSession) =>
        Workloads.pagerankSynth(s, 10_000_000L, 1_000_000L)),
      // scale-evidence twin for the SIMILARITY family: IVF build (Lloyd
      // over 1M in-engine 32-d clustered vectors, 256 cells) + serve
      // (1000 queries, exact cosine top-10 in 8 probed ~3.9k-vector
      // cells — ~31M candidate distance folds, linear in queries,
      // never corpus²)
      "ann_synth1m" -> ((s: SparkSession) =>
        Workloads.annSynth(s, 1_000_000L)),
      // scale-evidence twin for the TEXT family: the quality battery
      // (native token/shingle kernels) over 1M in-engine docs / 60M
      // tokens — linear scan throughput, one aggregate
      "textstats_synth1m" -> ((s: SparkSession) =>
        Workloads.textStatsSynth(s, 1_000_000L)),
      // scale-evidence twin for ExactSubstr: the anchored span pass
      // over the SAME 1M-doc/60M-token corpus as minhash_synth1m —
      // pins the two-hash-shuffle design (only the 1/stride content
      // anchors reach an exchange) at corpus scale
      "substr_synth1m" -> ((s: SparkSession) =>
        Workloads.substrSynth(s, 1_000_000L)),
      // END-TO-END curation pipeline at 250k docs: LSH near-dedup →
      // CC survivors → quality gate → hash split → sequence packing —
      // the composition number, not a single family
      "curation_synth250k" -> ((s: SparkSession) =>
        Workloads.curationSynth(s, 250_000L)),
      // DECREMENTAL fold at scale: a LOCALIZED delete (2 whole blobs,
      // ~8%) folded OUT of the standing 500k clustering — only those
      // components re-solve. State bootstrap is cached across reps,
      // so min-of-2 isolates fold + state re-pin + labels (~15 s;
      // the one corpus-sized stage, the bipartite deleted×remaining
      // ε-pass, profiles at ~2 s — the rest is the local-mode
      // state-refresh floor; the from-scratch yardstick beside it is
      // dbscan_synth500k, whose ε-SELF-join is the part that grows
      // superlinearly with corpus density at 100 TB)
      "dbscan_decr_synth500k" -> ((s: SparkSession) =>
        Workloads.dbscanDecrSynth(s, 500_000L, k = 25, dims = 5,
          eps = 1.0, minPts = 5)),
      // DURABILITY at scale: the same localized-delete fold, but the
      // standing state crosses a parquet save -> reload seam first
      // (the restarted-session path q235 oracles at sf scale) — the
      // delta vs dbscan_decr_synth500k is the price of persisting and
      // re-reading the four state tables
      "dbscan_state_rt_synth500k" -> ((s: SparkSession) =>
        Workloads.dbscanStateRoundTrip(s, 500_000L, k = 25, dims = 5,
          eps = 1.0, minPts = 5)),
      // ANN-index durability at scale (the round-10 IndexStore seam):
      // build the 1M-vector IVF artifacts, save under the commit
      // manifest, reload, serve — the delta vs ann_synth1m is the
      // persist + re-read price of the nightly restart path
      "ann_index_rt_synth1m" -> ((s: SparkSession) =>
        Workloads.annIndexRoundTrip(s, 1_000_000L)),
      // HIGH-DIMENSIONAL Euclidean ε-join at scale: the kd fallback
      // (coarse cells + ghosts + per-cell kd radius queries) over
      // 200k 32-d clustered vectors, ~70M true pairs at eps=0.2 —
      // the regime the 3-dim grid path can't prune
      "kdeps_synth200k" -> ((s: SparkSession) =>
        Workloads.kdEpsSynth(s, 200_000L, eps = 0.2)),
    )
    // 100× the reference's largest dataset, same per-cluster density
    // as the 500k diagnostic (k scales with n, ε-degree stays ~13).
    // Opt-in and ALWAYS single-rep: ~4–8 min at local[32] on a good
    // host — a second rep would be a round-budget hazard, and at this
    // duration warmup is noise. Committed profile in NOTES_DEV.md.
    val heavyDiagnostics: Seq[(String, SparkSession => DataFrame)] =
      if (sys.env.get("SPARK_GRAFT_BENCH_HEAVY").contains("1"))
        Seq("dbscan_synth5m" -> ((s: SparkSession) =>
          Workloads.dbscanSynth(s, 5_000_000L, k = 250, dims = 5,
            eps = 1.0, minPts = 5)))
      else Nil

    // min over reps, like the reference harness's repeated runs
    // (`manyTests.py:25-106` runs each config 10x) — strips JIT/codegen
    // warmup and GC noise from the comparison
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // a query that throws on EVERY rep reports -1 (and joins "failed"), not
    // the min of fast-fail timings; a query with >=1 clean rep reports the
    // min over the clean reps only
    def timeN(name: String, run: () => Unit, n: Int): Double = {
      val clean = (0 until n).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      if (clean.isEmpty) -1.0 else clean.min
    }
    // OUTLIER RE-ADJUDICATION (round-7 lesson: a 34.4 s kdeps number
    // shipped in BENCH_r07.json that a 90-second focused re-run proved
    // to be ~14 s — sweep cache pressure, not code): any workload whose
    // min-of-reps lands >2x above the PREVIOUS committed artifact (and
    // >0.5 s absolute, so sub-second jitter never triggers) re-runs
    // solo after a scrub, and the artifact records first/rerun/prev so
    // no committed number carries an unexplained >2x delta. A real
    // regression re-runs just as slow and stands; noise melts.
    // Per-cpu-count artifact name: the round driver runs the bench at
    // TWO core counts (32 then 8) and both wrote the same file, so the
    // low-core run clobbered the 32-core per-query map and the driver
    // could not score rounds per-query (PERF_r11 per_query: {}). The
    // legacy name is still written as a copy for old readers.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"/root/repo/BENCH_full_c$cpus.json")
    val legacyOut = "/root/repo/BENCH_full.json"
    def parseMins(path: String): Map[String, Double] =
      try {
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get(path))
        val num = "-?[0-9][0-9.]*(?:[Ee][+-]?[0-9]+)?"
        // headline queries: flat k:v pairs inside the "queries" object
        val qSection = s""""queries":\\{(.*?)\\}""".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
        val flat = s""""([A-Za-z0-9_]+)":($num)""".r
          .findAllMatchIn(qSection)
          .map(m => m.group(1) -> m.group(2).toDouble)
        // diagnostics: the only {"min": ...} shapes in the file
        val diag = (s""""([A-Za-z0-9_]+)":\\{"min":($num)""").r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
        (flat ++ diag).toMap.filter(_._2 >= 0)
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // cross-round reference (round-9 lesson: a regression that lands in a
    // MID-round sweep is already inside the committed BENCH_full.json by
    // round close, so comparing against that file alone can never flag
    // it). BENCH_full_prev.json is the PREVIOUS round's final sweep,
    // refreshed at each round close — a query is adjudicated if it's >2x
    // the BETTER of the two references.
    val prevMins: Map[String, Double] = {
      val cur0 = parseMins(sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", fullOut))
      // first run at this cpu count: fall back to the legacy
      // single-file artifact so adjudication isn't blind
      val cur = if (cur0.nonEmpty) cur0 else parseMins(legacyOut)
      val prevRoundPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV_ROUND",
        "/root/repo/BENCH_full_prev.json")
      val lastRound = parseMins(prevRoundPath)
      // an unreadable cross-round reference silently reopens the very
      // blind spot this comparison closes — say so
      if (lastRound.isEmpty)
        System.err.println(s"[bench] WARNING: no cross-round reference " +
          s"at $prevRoundPath — adjudication compares against the " +
          "current committed file only")
      (cur.keySet ++ lastRound.keySet).map { k =>
        k -> (cur.get(k).toSeq ++ lastRound.get(k).toSeq).min
      }.toMap
    }
    val adjudicated =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double,
        Double)]
    def timeAdj(name: String, run: () => Unit, n: Int): Double = {
      val first = timeN(name, run, n)
      prevMins.get(name) match {
        case Some(p) if first >= 0 && first > 2 * p && first - p > 0.5 =>
          spark.catalog.clearCache(); System.gc()
          val rerun = timeN(name, run, n)
          adjudicated += ((name, first, rerun, p))
          // report the SOLO re-run, not min(first, rerun): the rerun is
          // the controlled measurement (sweep cache pressure stripped),
          // and min() could only ratchet downward — a warm rerun would
          // mask a genuine regression. A rerun that CONFIRMS the
          // slowdown (also >2x prev) stands as measured; first/rerun
          // disagreement stays visible in the adjudicated record.
          if (rerun >= 0) {
            if (first > 2 * rerun)
              System.err.println(f"[bench] $name adjudication disagreement" +
                f" >2x: first=$first%.2f rerun=$rerun%.2f — sweep-order" +
                " artifact, rerun recorded")
            else if (rerun > 2 * first)
              // symmetric case: an anomalously SLOW rerun (GC pause,
              // thermal throttle) would otherwise stand as the recorded
              // value with no visible warning
              System.err.println(f"[bench] $name adjudication disagreement" +
                f" >2x: rerun=$rerun%.2f vs first=$first%.2f — noisy" +
                " rerun, recorded value is suspect")
            else
              System.err.println(f"[bench] $name adjudicated: " +
                f"first=$first%.2f rerun=$rerun%.2f prev=$p%.2f")
            rerun
          } else first
        case _ => first
      }
    }
    def time(name: String, run: () => Unit): Double = timeAdj(name, run, reps)
    // comma-separated substring filter for focused iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=q9,q10 — unset runs everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    // untimed warmup: whichever workload runs FIRST otherwise absorbs
    // the JVM-wide JIT + codegen warmup of the entire SQL stack — a
    // cost min-of-reps cannot strip, because both of the first query's
    // reps pay it (observed as a 2-3x outlier on the alphabetically
    // first query in round runs). Two cheap representative plans (an
    // agg and a text kernel) front-load that once, outside any timing.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0")
      Seq("q8_agg_pricing", "q11_token_stats").foreach { q =>
        // a silently-skipped warmup would let the first-query JIT
        // outlier return with zero signal — warn loudly instead
        SparkEntry.queries.get(q) match {
          case None =>
            System.err.println(s"[bench] warmup query $q no longer exists")
          case Some(fn) =>
            try fn(spark, sfDir).count()
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] warmup $q failed: ${e.getMessage}")
            }
        }
      }
    // clearCache + System.gc() between workloads, outside any timing:
    // operators persist() intermediates and rely on the ContextCleaner
    // for release; across a 150+-query sweep the cached blocks plus
    // old-gen garbage accumulate into pressure that inflates LATE
    // queries 3-4x (measured: q128 10.7 s late in a sweep vs 2.8 s
    // alone — BOTH reps inflated, so min-of-reps cannot strip it). The
    // reference harness restarts its process per run (`manyTests.py`);
    // an explicit full GC on a just-cleared heap is the JVM analog and
    // costs ~0.1-0.3 s per workload.
    def scrub(): Unit = { spark.catalog.clearCache(); System.gc() }
    val sfResults = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(p => selected(p._1)).map { case (name, fn) =>
        val r = name -> time(name, () => fn(spark, sfDir).count())
        scrub()
        r
      }
    def runRef(bench: Seq[(String, SparkSession => DataFrame)],
        repsOverride: Int = reps) =
      bench.filter(p => selected(p._1)).map { case (name, fn) =>
        val r = name -> timeAdj(name, () => fn(spark).count(), repsOverride)
        // each workload persists its point table (and Dbscan.run persists
        // pairs/cores internally); CacheManager holds those strongly, so
        // scrub between workloads or their blocks skew later timings.
        // Within-workload reps still share cache (same logical plan).
        scrub()
        r
      }
    val refResults = runRef(referenceBench)
    val diagReps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "2").toInt
    val diagResults = runRef(diagnosticsBench) ++
      runRef(scaleDiagnostics, repsOverride = diagReps) ++
      runRef(heavyDiagnostics, repsOverride = 1)
    val diagRepsOf = (diagnosticsBench.map(_._1 -> reps) ++
      scaleDiagnostics.map(_._1 -> diagReps) ++
      heavyDiagnostics.map(_._1 -> 1)).toMap
    // The reference harness's remaining datasets, with its own
    // per-dataset (eps, minPts) matrix (manyTests.py:29-55) — timed
    // once each and recorded WITH the clustering itself: point/cluster/
    // noise counts plus an order-free label checksum
    // (Scaling.fingerprint), so later rounds diff the LABELS, not just
    // the wall clock. The reference recorded 2-rank cluster-count
    // goldens only for clus50k (51) and part64 (6)
    // (Progress-5-Nov-19.txt:9-53); for these six the checksum
    // recorded here becomes the standing golden.
    val refMatrix: Seq[(String, String, Double, Int)] = Seq(
      ("ref_t4_8k", "/root/reference/t4.8k.bin", 10.0, 20),
      ("ref_t5_8k", "/root/reference/t5.8k.bin", 8.0, 21),
      ("ref_t7_10k", "/root/reference/t7.10k.bin", 10.0, 12),
      ("ref_t8_8k", "/root/reference/t8.8k.bin", 10.0, 10),
      ("ref_edge17695", "/root/reference/edge17695.bin", 3.0, 2),
      ("ref_texture17695", "/root/reference/texture17695.bin", 3.0, 2),
    )
    val refDatasetJson = refMatrix.filter(p => selected(p._1)).map {
      case (name, path, eps, mp) =>
        val t0 = System.nanoTime()
        val entry = try {
          val fp = Scaling.fingerprint(
            Workloads.dbscanBin(spark, path, eps, mp))
          val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
          val Array(n, k, noise, chk) = fp.split('|')
          s""""$name":{"sec":$sec,"eps":$eps,"min_pts":$mp,"n":$n,""" +
            s""""clusters":$k,"noise":$noise,"checksum":"$chk"}"""
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            s""""$name":{"sec":-1}"""
        }
        scrub()
        entry
    }.mkString("{", ",", "}")
    // Graph-ANN knob table (round-10): NN-Descent build + beam serve +
    // MEASURED recall@10 vs brute force on the ann_synth1m corpus
    // family — the (buildK, iters, ef, rounds) trade-off table a real
    // graph-ANN user tunes by, including the 1M-vector build. Recall
    // is deterministic (hash init, id ties), so these are standing
    // goldens. Opt out with SPARK_GRAFT_BENCH_GRAPH=0; single-shot
    // (builds are minutes-scale — a second rep is a budget hazard and
    // recall needs no variance control).
    // The measured lessons (AnnSearchSpec sweeps + the round-10 200k/1M
    // knob runs, 64-blob corpora): (a) a k-NN graph over well-separated
    // clusters DISCONNECTS into per-blob components, so flat-walk
    // recall ≈ the entries' blob coverage and rounds saturate by ~4;
    // (b) the LAYERED serve (sparse upper layer's cross-cluster links)
    // recovers recall at a 10-entry budget; (c) at growing n, BUILD
    // WIDTH dominates — buildK=10/iters=2 leaves the graph unconverged
    // (200k: 0.35 even with 256 entries; 1M: 0.10 @ 605 s build) while
    // buildK=20 reaches 0.76 at 200k (357 s build). Default rows run
    // at 50k per round; the 200k/1M rows ride SPARK_GRAFT_BENCH_HEAVY=1
    // (minutes-scale builds — the dbscan_synth5m rule), with the
    // round-10 measurements recorded in NOTES_DEV.md.
    // last field = ivfCells: 0 → NN-Descent build; > 0 → the
    // IVF-cell-sharded exact build (knnGraphIvf — round-11), whose
    // exchanges are linear in n and which therefore RUNS at 1M on this
    // host where NN-Descent at buildK=20 overflowed the shuffle disk
    val graphAnnConfigs
        : Seq[(String, Long, Int, Int, Int, Int, Int, Boolean, Int)] =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_GRAPH", "1") == "0") Nil
      else Seq(
        ("knn_graph_50k_lowentry", 50000L, 10, 2, 10, 2, 10, false, 0),
        ("knn_graph_50k_base", 50000L, 10, 2, 20, 4, 256, false, 0),
        ("knn_graph_50k_b20", 50000L, 20, 2, 20, 4, 256, false, 0),
        ("knn_graph_50k_ivf", 50000L, 20, 2, 20, 4, 256, false, 32),
        ("knn_graph_50k_layered", 50000L, 10, 2, 20, 4, 10, true, 0),
        // the HNSW-proper row (round-11): IVF+refine base graph +
        // multi-level layer stack (levelDiv=16, 4x growth, per-level
        // re-entry seeding) serving at a TEN-entry budget — must beat
        // the flat 256-entry walk over the same base (the 50k probe
        // measured 0.943 vs 0.9365)
        ("knn_graph_50k_ivf_layered", 50000L, 20, 2, 20, 4, 10, true,
          32)) ++
        (if (sys.env.get("SPARK_GRAFT_BENCH_HEAVY").contains("1"))
          Seq(
            ("knn_graph_200k_b20", 200000L, 20, 2, 20, 4, 256, false, 0),
            // NN-Descent's 1M row stays at buildK=10 ON THIS HOST: its
            // per-round candidate volume is n·(2K)² — at buildK=20
            // that is ~1.6B rows/round of shuffle spill, which filled
            // the 252 GB local disk (measured round 10); a real
            // cluster spreads the same volume across executors' disks.
            // The IVF-sharded row is the build that makes 1M USABLE
            // here: exact per-cell top-k inside 1024 coarse cells
            ("knn_graph_synth1m", 1000000L, 10, 2, 20, 4, 256, false, 0),
            ("knn_graph_synth1m_ivf", 1000000L, 20, 2, 32, 8, 256,
              false, 1024),
            // layered at a TEN-entry budget beats the flat 256-entry
            // walk on the same base (probe: 0.882 vs 0.857)
            ("knn_graph_synth1m_ivf_layered", 1000000L, 20, 2, 32, 8,
              10, true, 1024))
        else Nil)
    val graphAnnJson = graphAnnConfigs.filter(p => selected(p._1)).map {
      case (name, n, bk, it, ef, rd, ne, lay, cells) =>
        val entry = try {
          val (b, sv, rc, gr) = Workloads.knnGraphRecall(spark, n, bk, it,
            ef, rd, nEntries = ne, layered = lay, ivfCells = cells)
          s""""$name":{"n":$n,"build_k":$bk,"iters":$it,"ef":$ef,""" +
            s""""rounds":$rd,"n_entries":$ne,"layered":$lay,""" +
            s""""ivf_cells":$cells,""" +
            s""""build_sec":$b,"serve_sec":$sv,"recall_at_10":$rc,""" +
            s""""graph_recall_at_10":$gr}"""
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            s""""$name":{"build_sec":-1}"""
        }
        scrub()
        entry
    }.mkString("{", ",", "}")
    val results = sfResults ++ refResults
    def jsonMap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jsonMap(results)
    // diagnostics carry {min, reps} so round-over-round readers can see
    // what variance control the number had
    val diag = diagResults.map { case (k, v) =>
      "\"" + k + "\":{\"min\":" + v + ",\"reps\":" +
        diagRepsOf.getOrElse(k, 1) + "}"
    }.mkString("{", ",", "}")
    val failed = (results ++ diagResults)
      .collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val adjJson = adjudicated.map { case (n, f, r, p) =>
      s""""$n":{"first":$f,"rerun":$r,"prev":$p}"""
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$qs,"diagnostics":$diag,"ref_datasets":$refDatasetJson,"graph_ann":$graphAnnJson,"adjudicated":$adjJson,"failed":$failed,"sf":"$sfDir"}"""
    // Persist the full map to a committed PER-CPU-COUNT file (the round
    // driver's 8-core run used to clobber the 32-core artifact) and keep
    // writing the legacy single-file name for older readers — but only
    // on a full, non-overridden run: a focused SPARK_GRAFT_BENCH_ONLY /
    // custom-out iteration must not overwrite the committed artifact
    // with a partial map.
    val writeLegacy = only.isEmpty && !sys.env.contains("SPARK_GRAFT_BENCH_OUT")
    for (out <- (if (writeLegacy) Seq(fullOut, legacyOut) else Seq(fullOut))
        .distinct)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), full + "\n")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
      }
    val top10 = jsonMap(results.filter(_._2 >= 0).sortBy(-_._2).take(10))
    // n_failed shares n_queries' denominator (headline results only);
    // diagnostics report their own counter — mixing them made a failed
    // diagnostic read as a headline failure.
    // The stdout line carries the FULL per-query map: the driver scores
    // rounds per-query from this line (PERF_r11 per_query came up empty
    // with only a top10 here), and the committed files carry the same
    // map as a durable copy.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"n_queries":${results.size},"n_failed":${results.count(_._2 < 0)},"n_diag_failed":${diagResults.count(_._2 < 0)},"n_adjudicated":${adjudicated.size},"failed":$failed,"queries":$qs,"top10":$top10,"diagnostics":$diag,"full":"$fullOut","sf":"$sfDir"}""")
    spark.stop()
  }
}
