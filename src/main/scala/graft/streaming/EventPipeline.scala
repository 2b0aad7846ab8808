package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine. The reference has no
  * streaming at all (SURVEY §2.6) — this is part of the
  * training-data-pipeline extension: the same event-table aggregations as
  * the batch queries (SparkEntry q20), expressed as incremental streams.
  *
  * Design: streams are the SAME declarative plans as batch — a tumbling
  * window aggregate with a watermark compiles to an incremental stateful
  * HashAggregate; sessionization uses `session_window` (native state
  * store); bespoke state uses `flatMapGroupsWithState`. At scale, state is
  * partitioned by group key across executors and checkpointed — nothing
  * here collects to the driver.
  */
object EventPipeline {

  /** Streaming twin of q20_events_hourly: tumbling 1-hour counts/sums per
    * event type. Late data beyond the watermark is dropped (state can be
    * evicted — bounded memory at scale).
    * Input must have columns (ts: timestamp, event_type, value). */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * lit(100.0))) / lit(100.0)).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hr"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user sessionization with an inactivity gap: native
    * `session_window` keeps per-key session state in the state store. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * lit(100.0))) / lit(100.0)).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start"),
        unix_timestamp(col("sw.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: attribute each purchase to clicks by the
    * same user within the preceding `window`. Both sides carry watermarks,
    * so the state store can evict expired rows — the join is fully
    * incremental and append-mode safe at scale. */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    clicks.withWatermark("ts", watermark).alias("c")
      .join(purchases.withWatermark("ts", watermark).alias("p"),
        expr(s"""c.user_id = p.user_id AND
                 p.ts >= c.ts AND p.ts <= c.ts + INTERVAL $window"""))
      .select(col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"),
        col("p.value").as("value"))

  /** Streaming exact dedup by id — the incremental form of q15's exact
    * dedup, the first stage of a streaming ingestion pipeline. Keeps one
    * state-store entry per id seen within the watermark horizon; a
    * duplicate arriving in ANY later micro-batch (within the horizon) is
    * dropped, and state for ids older than the watermark is evicted —
    * bounded memory at 100 TB/day ingest rates, at the cost of not
    * catching dupes farther apart than `watermark` in event time (the
    * batch `dropDuplicates` / exact-hash dedup is the unbounded-horizon
    * complement).
    * Input must have columns (`idCol`, ts: timestamp). */
  def dedupByKey(events: DataFrame, idCol: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  case class Change(k: Long, seq: Long, op: String, payload: Double)

  /** Streaming twin of `operators.Cdc.latestWins`: one state-store entry
    * per key holding its winning change; every micro-batch emits the
    * keys whose winner changed (update mode — a MERGE-style sink applies
    * them; 'D' rows travel as tombstones for the sink to drop). The
    * comparison is (seq, op, payload) descending — the same total order
    * the batch operator's window uses — so replaying any prefix of the
    * stream matches the batch fold over the same rows, regardless of
    * micro-batch boundaries (spec-enforced). State is one row per key,
    * partitioned across executors; nothing driver-side. */
  def latestWinsStream(changes: Dataset[Change]): Dataset[Change] = {
    import changes.sparkSession.implicits._
    def wins(a: Change, b: Change): Boolean =
      a.seq > b.seq || (a.seq == b.seq && (a.op > b.op ||
        (a.op == b.op && a.payload > b.payload)))
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[Change, Change](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Change], state: GroupState[Change]) =>
          var cur = state.getOption.orNull
          var dirty = false
          rows.foreach { c =>
            if (cur == null || wins(c, cur)) { cur = c; dirty = true }
          }
          if (dirty) { state.update(cur); Iterator(cur) }
          else Iterator.empty
      }
  }

  case class SeqEvent(user_id: Long, ms: Long, event_id: Long,
    event_type: String)
  case class Step(user_id: Long, src_type: String, dst_type: String)

  case class SessEvent(user_id: Long, ms: Long, event_id: Long)
  case class SessionState(session_id: Int, start_ms: Long, end_ms: Long,
    n: Long)
  case class Session(user_id: Long, session_id: Int, n_events: Long,
    start_ms: Long, end_ms: Long)

  /** Streaming twin of the batch gaps-and-islands sessionization (the
    * q21 table): one state entry per user holding the OPEN session
    * (id, bounds, count); an arrival more than `gapMs` past the open
    * session's end CLOSES it — the closed row is appended, and the
    * emitted rows are bit-identical to the batch operator's (same
    * strict-> gap test, same 1-based numbering). The native
    * `session_window` twin ([[sessionize]]) gives watermark-driven
    * finalization but window-bound output; this one exists when
    * downstream wants the batch table's exact shape incrementally.
    *
    * Equivalence contract: emitted sessions == the batch table minus
    * each user's LAST session (still open in state, by construction —
    * a stream never knows its final event arrived). Per-user arrivals
    * must be in event-time order across micro-batches; within a batch
    * the per-batch (ms, event_id) sort recovers any order
    * (transitionsStream's contract, spec-enforced). */
  def sessionsStream(events: Dataset[SessEvent],
      gapMs: Long = 1800000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SessEvent],
            state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ms, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            if (st == null) st = SessionState(1, e.ms, e.ms, 1L)
            else if (e.ms - st.end_ms > gapMs) {
              out += Session(uid, st.session_id, st.n, st.start_ms,
                st.end_ms)
              st = SessionState(st.session_id + 1, e.ms, e.ms, 1L)
            } else st = SessionState(st.session_id, st.start_ms, e.ms,
              st.n + 1)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of `operators.Sequences.transitions`' step
    * extraction: one state-store entry per key holding the LAST event
    * seen; each micro-batch sorts its per-key arrivals by (ms,
    * event_id) — the batch operator's window order — chains them onto
    * the stored event, and appends the (src → dst) steps. Counting the
    * steps downstream (any grouped aggregate) reproduces the batch
    * transition matrix.
    *
    * Equivalence contract: per-key arrivals must be in event-time order
    * ACROSS micro-batches (within a batch any order is fine — the
    * per-batch sort handles it). A row older than the stored state
    * would need retroactive insertion into the timeline, which no
    * single-entry state can express — the same in-order caveat as any
    * streaming sequence analytics; the batch operator is the
    * out-of-order-tolerant complement (spec-enforced equivalence on
    * order-respecting micro-batch splits). */
  def transitionsStream(events: Dataset[SeqEvent]): Dataset[Step] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqEvent, Step](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqEvent]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ms, e.event_id))
          var prev = state.getOption.orNull
          val out = Seq.newBuilder[Step]
          sorted.foreach { e =>
            if (prev != null) out += Step(uid, prev.event_type, e.event_type)
            prev = e
          }
          if (prev != null) state.update(prev)
          out.result().iterator
      }
  }

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: running per-user event
    * count + value total, emitted on every update (the
    * `KeyValueGroupedDataset` escape hatch for semantics windows can't
    * express). */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e =>
            n += 1
            // HALF_UP like Spark's round() in the batch/stream twins —
            // math.rint is half-EVEN and would diverge on exact .xx5
            tot += java.math.BigDecimal.valueOf(e.value * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .doubleValue() / 100
          }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator(next)
      }
  }

  case class WeightedDoc(g: String, id: Long, w: Long)
  case class ReservoirBuf(ids: Seq[Long], scores: Seq[Double])
  case class Reservoir(g: String, ids: Seq[Long])

  /** Streaming twin of
    * [[graft.operators.Curation.weightedSampleKPerGroup]]: a per-group
    * A-ES weighted reservoir maintained across micro-batches with
    * `flatMapGroupsWithState` — continuous importance-weighted corpus
    * subsampling over an ingest stream. State is BOUNDED: exactly the
    * current k (id, score) pairs per group, folded through the same
    * [[graft.functions.TopKByScore.Heap]] the batch aggregate uses, with
    * scores from the scalar A-ES key twin (`Curation.aesScore`). Because
    * the key is deterministic per id and min-k is an associative,
    * arrival-order-free fold, the reservoir after ANY prefix of the
    * stream equals the batch operator over the rows seen so far —
    * micro-batch boundaries are semantics-free (spec-enforced).
    *
    * Update mode: each batch re-emits the groups it touched with their
    * full current reservoir (latest row per group = current sample). */
  def weightedSampleStream(rows: Dataset[WeightedDoc], k: Int,
      salt: String): Dataset[Reservoir] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .flatMapGroupsWithState[ReservoirBuf, Reservoir](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[WeightedDoc],
            state: GroupState[ReservoirBuf]) =>
          val heap = new graft.functions.TopKByScore.Heap(k)
          state.getOption.foreach { s =>
            s.ids.lazyZip(s.scores).foreach((i, sc) => heap.push(i, sc))
          }
          it.foreach { r =>
            heap.push(r.id, graft.operators.Curation.aesScore(r.id, r.w,
              salt))
          }
          val kept = heap.sortedAsc
          state.update(ReservoirBuf(kept.map(_._1).toSeq,
            kept.map(_._2).toSeq))
          Iterator(Reservoir(g, kept.map(_._1).toSeq))
      }
  }

  /** Streaming incremental near-dup ingest: every micro-batch of new
    * documents is LSH-screened and exact-verified against a static
    * [[graft.operators.Dedup.minHashIndex]] via `foreachBatch` — the
    * steady-state corpus-ingest job, continuously. Because the batch
    * operator pairs each new doc against the INDEX only (never against
    * other new docs), micro-batch boundaries are semantics-free: the
    * union of per-batch outputs equals one batch run over everything
    * streamed (spec-enforced). The index stays a plain DataFrame —
    * re-read it per batch inside `sink` callers that need index
    * refresh; state lives in the index, not the stream.
    *
    * @param sink receives each micro-batch's flagged pairs
    *   (`new_id`, `idx_id`, `jac`) with the batch id — it must CONSUME
    *   the frame synchronously (collect/write), because the batch's
    *   internal caches are released right after it returns
    * @return the started continuous query (caller stops it) */
  def dedupIngestStream(index: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, n: Int, minJaccard: Double)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the batch operator persist()s its per-batch shingle table and
        // index; a BATCH process sheds those via the ContextCleaner at
        // plan death, but a continuous query never ends — without
        // explicit release, a steady-state stream accrues two cached
        // tables per micro-batch until storage memory thrashes. Diff
        // the persistent-RDD registry around the batch and drop exactly
        // the additions, leaving the caller's long-lived index cache
        // (and anything else pre-existing) untouched.
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        try sink(graft.operators.Dedup.minHashJoinAgainst(
          index, batch.toDF(), idCol, textCol, n, minJaccard), id)
        finally sc.getPersistentRDDs
          .filterNot { case (rddId, _) => before(rddId) }
          .values.foreach(_.unpersist(blocking = false))
      }
      .start()

  /** CONTINUOUS clustering: fold every micro-batch of new points into an
    * [[graft.operators.IncrementalDbscan]] state — the standing corpus is
    * never re-joined against itself, and after each batch the labels are
    * identical to a from-scratch batch clustering of everything seen so
    * far (spec-enforced). The streaming answer to the reference's
    * read-file-recluster-everything cycle.
    *
    * State lifecycle per batch: the four state tables are pinned with an
    * EAGER `localCheckpoint` — severing lineage so the state's DAG does
    * not deepen with every batch — then the batch's transient caches
    * (the delta-join persists inside addPoints/labels) and the PREVIOUS
    * batch's superseded checkpoints are released by diffing the
    * persistent-RDD registry against the pinned tables' RDD ancestry
    * (post-checkpoint lineage is short and ends AT the checkpoint
    * blocks, so the walk marks exactly the new state as keep-alive).
    * Caches that existed before the batch (the caller's) are untouched.
    *
    * @param initial bootstrap state ([[graft.operators.IncrementalDbscan
    *   .init]]); its caches belong to the caller
    * @param newPoints streaming (idCol, vecCol) rows; ids must be fresh
    *   across all batches
    * @param sink receives each batch's FULL label table (id, cluster_id)
    *   with the batch id — must consume synchronously (the batch's
    *   transient caches are released right after it returns)
    * @return the started continuous query (caller stops it) */
  def clusterIngestStream(initial: graft.operators.IncrementalDbscan.State,
      newPoints: DataFrame, idCol: String, vecCol: String, eps: Double,
      minPts: Int, bucketDims: Seq[Int])(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val I = graft.operators.IncrementalDbscan
    clusterFoldStream(initial, newPoints, sink) { (st, batch) =>
      I.addPoints(st, batch, idCol, vecCol, eps, minPts, bucketDims)
    }
  }

  /** CDC-shaped standing-cluster MAINTENANCE: micro-batches carry
    * (`opCol` ∈ {"insert", "delete"}, `idCol`, `vecCol`) change rows.
    * Each trigger folds the batch's deletes OUT
    * ([[graft.operators.IncrementalDbscan.removePoints]]) and then its
    * inserts IN ([[graft.operators.IncrementalDbscan.addPoints]]) —
    * deletes first, so one batch may retract an id and re-insert it
    * (the takedown-then-replace shape). Labels at every trigger equal
    * the equivalent batch fold sequence, hence a from-scratch
    * clustering of the live point set (spec-enforced) — the streaming
    * face of deletion-aware standing state. Unknown op values fail the
    * batch loudly.
    *
    * STATE BOUND AND COMPACTION (the day-scale CDC contract): the
    * standing state is the four pinned tables, localCheckpoint blocks
    * in executor memory/disk — size ∝ the LIVE point set (points +
    * counts are O(n); coreComp O(cores); borderPairs O(border ε-pairs,
    * capped by minPts-bounded degree per border), NOT ∝ stream length:
    * the per-trigger sweep releases every block reachable only from
    * the previous state, so a day of constant-churn triggers holds
    * block count and bytes flat (spec-measured over 10 triggers of
    * insert-30/delete-30 churn — registry and bytes stay within 2× of
    * trigger 1). Durability is the caller's cadence: localCheckpoint
    * blocks do NOT survive executor loss, so periodically
    * [[graft.operators.IncrementalDbscan.saveState]] the sunk state —
    * that parquet save IS the checkpoint compaction point (manifest-
    * guarded, q235's machinery) — and resume with `loadState` +
    * re-subscribe from the CDC offset recorded alongside it; the save
    * interval is exactly the recovery point objective. */
  def clusterMaintainStream(
      initial: graft.operators.IncrementalDbscan.State,
      changes: DataFrame, opCol: String, idCol: String, vecCol: String,
      eps: Double, minPts: Int, bucketDims: Seq[Int])(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val I = graft.operators.IncrementalDbscan
    clusterFoldStream(initial, changes, sink) { (st, batch) =>
      // null-safe: `!isin(...)` evaluates to NULL for a NULL op, which
      // would drop the row from `bad` AND from both fold filters —
      // silently discarded instead of failing loudly as promised
      val bad = batch.filter(
        !(col(opCol).isin("insert", "delete") <=> lit(true)))
      if (!bad.isEmpty)
        throw new IllegalArgumentException(
          s"unknown $opCol value: ${bad.select(opCol).head.get(0)}")
      val dels = batch.filter(col(opCol) === "delete").select(col(idCol))
      val adds = batch.filter(col(opCol) === "insert")
        .select(col(idCol), col(vecCol))
      // pin BETWEEN the two folds, not just after the batch: the add
      // fold's internal eager steps otherwise execute against the
      // whole unpinned delete-fold DAG, whose tree STRING alone
      // (repeated shared subtrees print multiplicatively) has blown a
      // test-suite heap inside explainString
      val afterDel =
        if (dels.isEmpty) st
        else I.pin(I.removePoints(st, dels, idCol, eps, minPts,
          bucketDims))
      if (adds.isEmpty) afterDel
      else I.addPoints(afterDel, adds, idCol, vecCol, eps, minPts,
        bucketDims)
    }
  }

  /** Shared fold→pin→sink→sweep loop of [[clusterIngestStream]] and
    * [[clusterMaintainStream]]: fold the micro-batch into the standing
    * state, pin the result, emit labels, then unpersist every cache
    * block reachable only from the PREVIOUS state (the fold and pin
    * allocate per-trigger; without the sweep the executor store grows
    * per batch). */
  private def clusterFoldStream(
      initial: graft.operators.IncrementalDbscan.State,
      stream: DataFrame, sink: (DataFrame, Long) => Unit)(
      fold: (graft.operators.IncrementalDbscan.State, DataFrame)
        => graft.operators.IncrementalDbscan.State)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val I = graft.operators.IncrementalDbscan
    var st = initial
    var prevPinned = Set.empty[Int]
    // caller-owned caches (the initial state's blocks) — never swept
    val protectedIds =
      initial.points.sparkSession.sparkContext.getPersistentRDDs.keySet
        .toSet
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val next = fold(st, batch.toDF())
        val pinned = I.pin(next)
        try sink(I.labels(pinned), id)
        finally {
          prevPinned = releaseSuperseded(sc, before, prevPinned,
            Seq(pinned.points, pinned.counts, pinned.coreComp,
              pinned.borderPairs), protectedIds)
          st = pinned
        }
      }
      .start()
  }

  /** The per-trigger cache sweep shared by the standing-state streams:
    * unpersist every cache block reachable only from the PREVIOUS
    * state (neither pre-existing nor an ancestor of the new pinned
    * tables), returning the new keep-alive set. Pre-batch caches that
    * aren't superseded state (the caller's) are untouched.
    *
    * `protectedIds` is the registry snapshot taken at STREAM start —
    * the caller's own caches (the initial state/graph/vector tables).
    * They are excluded from the returned keep-alive set as well as the
    * sweep itself: after a no-op trigger the kept state IS the initial
    * tables, and without the exclusion their caller-owned blocks would
    * enter prevPinned and be swept by a later trigger — breaking the
    * documented "its caches belong to the caller" contract. */
  private def releaseSuperseded(sc: org.apache.spark.SparkContext,
      before: scala.collection.Set[Int], prevPinned: Set[Int],
      keepDfs: Seq[DataFrame], protectedIds: Set[Int]): Set[Int] = {
    def ancestors(r: org.apache.spark.rdd.RDD[_],
        seen: scala.collection.mutable.Set[Int]): Unit =
      if (seen.add(r.id)) r.dependencies.foreach(d =>
        ancestors(d.rdd, seen))
    val keep = scala.collection.mutable.Set.empty[Int]
    keepDfs.foreach(df => ancestors(df.rdd, keep))
    val reg = sc.getPersistentRDDs
    reg.filter { case (rid, _) =>
      !keep(rid) && !protectedIds(rid) &&
        (!before(rid) || prevPinned(rid))
    }.values.foreach(_.unpersist(blocking = false))
    reg.keySet.filter(rid => keep(rid) && !protectedIds(rid)).toSet
  }

  /** CDC-shaped standing k-NN-GRAPH maintenance — the ANN member of
    * the streaming-state family ([[clusterMaintainStream]]'s shape
    * over [[graft.operators.AnnSearch]]'s graph CRUD): micro-batches
    * carry (`opCol` ∈ {"insert", "delete"}, `idCol`, `vecCol`) change
    * rows; each trigger folds the batch's deletes OUT
    * ([[graft.operators.AnnSearch.retractFromKnnGraph]] — edges
    * touching removed ids tombstone, the vector table drops them) and
    * then its inserts IN ([[graft.operators.AnnSearch.addToKnnGraph]]
    * — the batch beam-searches the standing graph, discovered vertices
    * re-prune). Deletes first, so one batch may retract an id and
    * re-insert it (takedown-then-replace). The edge table at every
    * trigger is bit-equal to the same fold sequence applied in batch
    * (spec-enforced) — like the batch dual, the graph is
    * insertion-ORDER-dependent by design (real graph indexes are), so
    * the stream's contract is fold equality, not rebuild equality.
    *
    * State = (edge table, vector table), pinned per trigger with eager
    * `localCheckpoint`s; superseded blocks are swept exactly like
    * [[clusterMaintainStream]] (state size ∝ live corpus, not stream
    * length). Durability is the caller's cadence:
    * [[graft.operators.IndexStore.saveKnnGraph]] the sunk edge table
    * (plus the vector table) on the recovery-point interval and resume
    * with `loadKnnGraph` + the CDC offset recorded alongside.
    *
    * @param initialGraph standing (a_id, nbr_id, rnk) edges over
    *   `initialVecs`; its caches belong to the caller
    * @param initialVecs the standing corpus (`b_id`, `b_v`)
    * @param changes streaming (opCol, idCol, vecCol) rows; deletes may
    *   carry a NULL vector
    * @param k graph out-degree; @param ef/@param rounds/@param nEntries
    *   the insert walk's [[graft.operators.AnnSearch.graphTopK]] shape
    * @param sink receives each trigger's FULL updated edge table with
    *   the batch id — consume synchronously (superseded caches are
    *   released right after it returns)
    * @return the started continuous query (caller stops it) */
  def indexMaintainStream(initialGraph: DataFrame, initialVecs: DataFrame,
      changes: DataFrame, opCol: String, idCol: String, vecCol: String,
      k: Int, ef: Int, rounds: Int, nEntries: Int, seed: Long = 42L)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val A = graft.operators.AnnSearch
    var graph = initialGraph
    var vecs = initialVecs
    var prevPinned = Set.empty[Int]
    // caller-owned caches (initialGraph/initialVecs blocks) — never
    // swept, per the @param contract
    val protectedIds = initialGraph.sparkSession.sparkContext
      .getPersistentRDDs.keySet.toSet
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        // the batch plan (often a stream-static join) is consumed by
        // FOUR+ actions per trigger (op check, two emptiness probes,
        // the folds) — cache it; the end-of-trigger sweep releases it
        // (the pinned state is checkpointed, so the batch cache is
        // never one of its ancestors)
        val b = batch.toDF().persist()
        // null-safe loud failure on unknown ops (the
        // clusterMaintainStream rule: bare !isin drops NULL ops)
        val bad = b.filter(
          !(col(opCol).isin("insert", "delete") <=> lit(true)))
        if (!bad.isEmpty)
          throw new IllegalArgumentException(
            s"unknown $opCol value: ${bad.select(opCol).head.get(0)}")
        val dels = b.filter(col(opCol) === "delete").select(col(idCol))
        val adds = b.filter(col(opCol) === "insert")
          .select(col(idCol), col(vecCol))
        val (g1, v1) =
          if (dels.isEmpty) (graph, vecs)
          else (
            A.retractFromKnnGraph(graph, dels, idCol).localCheckpoint(),
            vecs.join(dels.select(col(idCol).as("b_id")).distinct(),
              Seq("b_id"), "left_anti").localCheckpoint())
        val (g2, v2) =
          if (adds.isEmpty) (g1, v1)
          else (
            // addToKnnGraph localCheckpoints its own output
            A.addToKnnGraph(g1, v1, adds, idCol, vecCol, k, ef, rounds,
              nEntries, seed),
            v1.unionByName(adds.select(col(idCol).as("b_id"),
              col(vecCol).as("b_v"))).localCheckpoint())
        try sink(g2, id)
        finally {
          prevPinned = releaseSuperseded(sc, before, prevPinned,
            Seq(g2, v2), protectedIds)
          graph = g2
          vecs = v2
        }
      }
      .start()
  }

  /** [[indexMaintainStream]] extended to a LAYERED standing index —
    * the (base graph, layer-graph stack) pair [[graft.operators
    * .AnnSearch.layerGraphs]] builds and [[graft.operators.AnnSearch
    * .graphTopKLayeredMulti]] serves. Without this, a maintained index
    * served through the layered path silently degrades: no insert is
    * ever promoted into the routing layers (HNSW assigns levels AT
    * INSERT — here the md5 rule, a pure function of the id) and a
    * deleted promoted vector leaves a hole in them.
    *
    * Per trigger, per level (divisor `d` in `initialLayers`): deletes
    * tombstone out of the level graph exactly like the base
    * ([[graft.operators.AnnSearch.retractFromKnnGraph]] — ids not in
    * the level are no-ops), and the batch's inserts whose md5 hash
    * promotes at `d` fold in via [[graft.operators.AnnSearch
    * .addToKnnGraph]] against the level's PRE-batch corpus (derived
    * from the maintained vector table by the promotion predicate — the
    * levels never carry separate vector state). Fold order matches the
    * base: deletes first, then inserts, so takedown-then-replace works
    * per level too. Each trigger's every level is bit-equal to the
    * same fold applied in batch (spec-enforced; the stream's contract
    * is fold equality, like the base stream).
    *
    * @param initialLayers bottom-up (divisor, level graph) — divisors
    *   as in [[graft.operators.AnnSearch.layerPromoted]] (level i of
    *   [[graft.operators.AnnSearch.layerGraphs]] has divisor
    *   levelDiv·growth^(i-1))
    * @param sink receives (base edge table, per-level edge tables,
    *   batch id) each trigger — consume synchronously. */
  def indexMaintainStreamLayered(initialGraph: DataFrame,
      initialVecs: DataFrame, initialLayers: Seq[(Long, DataFrame)],
      changes: DataFrame, opCol: String, idCol: String, vecCol: String,
      k: Int, ef: Int, rounds: Int, nEntries: Int, seed: Long = 42L)(
      sink: (DataFrame, Seq[DataFrame], Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(initialLayers.nonEmpty, "need at least one layer")
    val A = graft.operators.AnnSearch
    var graph = initialGraph
    var vecs = initialVecs
    var layers = initialLayers
    var prevPinned = Set.empty[Int]
    val protectedIds = initialGraph.sparkSession.sparkContext
      .getPersistentRDDs.keySet.toSet
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val b = batch.toDF().persist()
        val bad = b.filter(
          !(col(opCol).isin("insert", "delete") <=> lit(true)))
        if (!bad.isEmpty)
          throw new IllegalArgumentException(
            s"unknown $opCol value: ${bad.select(opCol).head.get(0)}")
        val dels = b.filter(col(opCol) === "delete").select(col(idCol))
        val adds = b.filter(col(opCol) === "insert")
          .select(col(idCol), col(vecCol))
        val anyDels = !dels.isEmpty
        val (g1, v1) =
          if (!anyDels) (graph, vecs)
          else (
            A.retractFromKnnGraph(graph, dels, idCol).localCheckpoint(),
            vecs.join(dels.select(col(idCol).as("b_id")).distinct(),
              Seq("b_id"), "left_anti").localCheckpoint())
        val l1 = layers.map { case (d, lg) =>
          (d, if (!anyDels) lg
          else A.retractFromKnnGraph(lg, dels, idCol).localCheckpoint())
        }
        val (g2, v2) =
          if (adds.isEmpty) (g1, v1)
          else (
            A.addToKnnGraph(g1, v1, adds, idCol, vecCol, k, ef, rounds,
              nEntries, seed),
            v1.unionByName(adds.select(col(idCol).as("b_id"),
              col(vecCol).as("b_v"))).localCheckpoint())
        val l2 = l1.map { case (d, lg) =>
          val pAdds = adds.filter(A.layerPromoted(col(idCol), d, seed))
          (d, if (pAdds.isEmpty) lg
          else A.addToKnnGraph(lg,
            v1.filter(A.layerPromoted(col("b_id"), d, seed)),
            pAdds, idCol, vecCol, k, ef, rounds, nEntries, seed))
        }
        try sink(g2, l2.map(_._2), id)
        finally {
          prevPinned = releaseSuperseded(sc, before, prevPinned,
            g2 +: v2 +: l2.map(_._2), protectedIds)
          graph = g2
          vecs = v2
          layers = l2
        }
      }
      .start()
  }

  /** Continuous PSI drift monitor: running per-bin counts of the
    * stream (ONE complete-mode aggregate — the only streaming state)
    * scored each trigger against a static reference bin profile
    * (`bin`, `n_ref`) — the live twin of q183's batch drift report.
    *
    * Cohort A is the REFERENCE, B the stream; the scoring reuses
    * [[graft.operators.Stats.psiFromCounts]] verbatim, so the report
    * at any trigger equals the batch [[graft.operators.Stats.psi]]
    * over the rows seen so far (spec-enforced). Bins present on only
    * one side surface with a zero count and NULL psi_term — drift you
    * can SEE (a brand-new bin is the loudest drift there is), never
    * epsilon-smoothed away.
    *
    * Scale: state is the bin-count table (bins, not rows); the
    * reference joins broadcast-size inside each trigger's sink pass.
    *
    * @param reference (`bin`, `n_ref`) — the stored training profile
    * @param sink receives each trigger's (bin, n_a, n_b, psi_term)
    * @return the started continuous query (caller stops it) */
  def driftMonitorStream(stream: DataFrame, binExpr: Column,
      reference: DataFrame)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the reference is static by contract but its PLAN need not be a
    // cached scan — persist once or every trigger re-derives it
    // (lives for the query's lifetime; the caller may unpersist after
    // stop(), or the ContextCleaner sheds it with the plan)
    val ref = reference.select(col("bin"), col("n_ref")).persist()
    stream.select(binExpr.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_live"))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (binCounts: Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val combined = ref
          .join(binCounts.toDF(), Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("n_ref"), lit(0L)).as("n_a"),
            coalesce(col("n_live"), lit(0L)).as("n_b"))
        sink(graft.operators.Stats.psiFromCounts(combined), id)
      }
      .start()
  }

  case class SeriesPoint(key: String, ord: Long, x: Long)
  case class HoltState(level: Double, trend: Double)
  case class HoltPoint(key: String, ord: Long, x: Long,
    level: Double, trend: Double)

  /** Streaming twin of [[graft.operators.TimeSeries.holt]]: per-key
    * Holt level+trend state (two doubles) folded over arriving series
    * points via `flatMapGroupsWithState` — the live-metrics smoother.
    * Each micro-batch sorts its per-key arrivals by `ord` (the batch
    * operator's sort order) and chains them onto the stored state, so
    * any order-respecting micro-batch split replays the batch fold's
    * EXACT doubles (spec-enforced). Same in-order-across-batches
    * contract as [[transitionsStream]]; α = 1/2, β = 1/4 fixed to the
    * batch defaults. */
  def holtStream(points: Dataset[SeriesPoint]): Dataset[HoltPoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[SeriesPoint],
            state: GroupState[HoltState]) =>
          val sorted = rows.toSeq.sortBy(_.ord)
          var st = state.getOption.orNull
          val out = Seq.newBuilder[HoltPoint]
          sorted.foreach { p =>
            val x = p.x.toDouble
            st = if (st == null) HoltState(x, 0.0)
            else {
              val lNew = 0.5 * x + 0.5 * (st.level + st.trend)
              HoltState(lNew, 0.25 * (lNew - st.level) + 0.75 * st.trend)
            }
            out += HoltPoint(key, p.ord, p.x, st.level, st.trend)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
