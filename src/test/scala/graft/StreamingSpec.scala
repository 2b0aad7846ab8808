package graft

import java.sql.Timestamp

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming correctness: the streaming pipelines must agree
  * with their batch twins over the same input. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val sample = Seq(
    (ts("2024-01-01 10:05:00"), "click", 1.25, 1L),
    (ts("2024-01-01 10:45:00"), "click", 2.50, 1L),
    (ts("2024-01-01 10:55:00"), "view", 0.75, 2L),
    (ts("2024-01-01 11:10:00"), "click", 3.00, 1L),
    (ts("2024-01-01 12:30:00"), "view", 4.25, 2L),
    (ts("2024-01-01 12:59:00"), "view", 0.10, 3L))

  test("streaming hourlyAgg == batch groupBy over same rows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = EventPipeline.hourlyAgg(events)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .select("hr", "event_type", "n", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet

      val batch = spark.createDataFrame(sample).toDF("ts", "event_type", "value", "user_id")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * lit(100.0))) / lit(100.0)).as("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming sessionize groups by inactivity gap") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = EventPipeline.sessionize(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
      // user 1: 10:05 | 10:45+11:10 chained within gap -> 2 sessions (1,2)
      // user 2: 10:55 | 12:30 -> 2 sessions (1,1); user 3: 12:59 -> 1
      assert(got == List((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L), (3L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventPipeline.attributedPurchases(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"))
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
      purchases.addData(
        (1L, ts("2024-01-01 10:20:00"), 9.99),  // within 30 min of click -> joins
        (2L, ts("2024-01-01 11:30:00"), 5.00),  // 85 min after click -> no join
        (3L, ts("2024-01-01 10:10:00"), 1.00))  // no click at all -> no join
      q.processAllAvailable()
      val got = spark.table("attributed")
        .select("user_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 9.99)))
    } finally q.stop()
  }

  test("watermark finalizes windows in append mode and drops late data") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = EventPipeline.hourlyAgg(events)
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      // batch 1: two hour-10 events. Watermark (2h) stays behind the
      // window end -> append mode emits nothing yet.
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.25, 1L),
        (ts("2024-01-01 10:45:00"), "click", 2.50, 1L))
      q.processAllAvailable()
      assert(spark.table("hourly_append").count() == 0L)

      // batch 2: an event at 13:30 advances the watermark to 11:30,
      // past the hour-10 window end (11:00) -> hour-10 finalizes with
      // EXACTLY the two rows above, and its state is evicted.
      mem.addData((ts("2024-01-01 13:30:00"), "view", 0.75, 2L))
      q.processAllAvailable()
      val hr10 = ts("2024-01-01 10:00:00").getTime / 1000
      val emitted = spark.table("hourly_append")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(emitted.toSet == Set((hr10, "click", 2L, 3.75)))

      // batch 3: a LATE hour-10 event behind the watermark must be
      // dropped — no new or changed hour-10 output ever appears.
      mem.addData((ts("2024-01-01 10:10:00"), "click", 99.0, 3L))
      q.processAllAvailable()
      val after = spark.table("hourly_append")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(after.toSet == Set((hr10, "click", 2L, 3.75)))
      assert(after.length == 1)
    } finally q.stop()
  }

  test("stream-stream join drops purchases behind the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventPipeline.attributedPurchases(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"))
    val q = joined.writeStream.format("memory").queryName("attributed_wm")
      .outputMode("append").start()
    try {
      // in-window attribution works, and both sides see 13:00 events so
      // the joint watermark advances to 12:00 (1h behind max event time)
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (9L, ts("2024-01-01 13:00:00")))
      purchases.addData(
        (1L, ts("2024-01-01 10:20:00"), 9.99),
        (9L, ts("2024-01-01 13:00:00"), 0.01))
      q.processAllAvailable()
      // run another batch so the watermark from batch 1 takes effect
      clicks.addData((8L, ts("2024-01-01 13:01:00")))
      q.processAllAvailable()
      val base = spark.table("attributed_wm")
        .select("user_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(base == Set((1L, 9.99), (9L, 0.01)))

      // a purchase at 10:25 is now behind the 12:00 watermark: the state
      // for user 1's click has been evicted and the row is discarded —
      // even though a matching click existed
      purchases.addData((1L, ts("2024-01-01 10:25:00"), 50.0))
      q.processAllAvailable()
      val after = spark.table("attributed_wm")
        .select("user_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(after == base)
    } finally q.stop()
  }

  test("streaming dedupByKey drops cross-batch duplicates within the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "payload")
    val q = EventPipeline.dedupByKey(events, "event_id", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: a dupe WITHIN the batch -> one survivor
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "first"),
        (1L, ts("2024-01-01 10:00:30"), "dupe-same-batch"),
        (2L, ts("2024-01-01 10:01:00"), "other"))
      q.processAllAvailable()
      // batch 2: a dupe of id 1 from a LATER micro-batch (state-store hit)
      // plus a fresh id
      mem.addData(
        (1L, ts("2024-01-01 10:20:00"), "dupe-cross-batch"),
        (3L, ts("2024-01-01 10:21:00"), "fresh"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("streaming dedup ingest over micro-batches == one batch run") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").persist()
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    val index = graft.operators.Dedup
      .minHashIndex(old, "doc_id", "text", 3).persist()
    index.count()
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[(Long, Long), Double]
    val q = EventPipeline.dedupIngestStream(index,
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", 3, 0.5) {
      (flagged, _) =>
        flagged.collect().foreach(r =>
          got.synchronized {
            got((r.getLong(0), r.getLong(1))) = r.getDouble(2)
          })
    }
    try {
      // arbitrary micro-batch split: boundaries must not change results
      val (b1, b2) = fresh.splitAt(fresh.length / 3)
      mem.addData(b1); q.processAllAvailable()
      // per-batch caches must be RELEASED: a steady-state stream would
      // otherwise accrue two cached tables per micro-batch forever
      val cachedAfterB1 = spark.sparkContext.getPersistentRDDs.size
      mem.addData(b2); q.processAllAvailable()
      assert(spark.sparkContext.getPersistentRDDs.size <= cachedAfterB1,
        "cache registry grew across micro-batches")
    } finally q.stop()
    val want = graft.operators.Dedup.minHashJoinAgainst(index,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.toMap == want)
    assert(want.nonEmpty, "fixture produced no cross-split near-dups")
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventPipeline.UserEvent]
    val q = EventPipeline.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    try {
      mem.addData(EventPipeline.UserEvent(7L, ts("2024-01-01 10:00:00"), 1.5))
      q.processAllAvailable()
      mem.addData(EventPipeline.UserEvent(7L, ts("2024-01-01 10:01:00"), 2.25))
      q.processAllAvailable()
      val rows = spark.table("running_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // update mode emits one row per batch; the LAST reflects full state
      assert(rows.contains((7L, 2L, 3.75)))
    } finally q.stop()
  }

  test("streaming weighted reservoir == batch A-ES sample, any batching") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 120 rows over 3 groups, weights alternating 40/1 within each group
    val all = (0L until 120L).map(i =>
      EventPipeline.WeightedDoc((i % 3).toString, i,
        if ((i / 3) % 2 == 0) 40L else 1L))
    val mem = MemoryStream[EventPipeline.WeightedDoc]
    val q = EventPipeline.weightedSampleStream(mem.toDS(), 5, "rs1")
      .writeStream.format("memory").queryName("reservoir_out")
      .outputMode("update").start()
    try {
      // deliberately uneven batching — state must make it order-free
      mem.addData(all.take(50): _*)
      q.processAllAvailable()
      // mid-stream check: reservoir == batch operator over the prefix
      // memory sink keeps batch append order; later rows overwrite
      // earlier ones in the fold = latest reservoir per group
      def latest(): Map[String, Set[Long]] = spark.table("reservoir_out")
        .collect().foldLeft(Map.empty[String, Set[Long]]) { (m, r) =>
          m + (r.getString(0) -> r.getSeq[Long](1).toSet)
        }
      def batchOn(rows: Seq[EventPipeline.WeightedDoc]) =
        graft.operators.Curation.weightedSampleKPerGroup(
          rows.toDF("g", "id", "w"), Seq("g"), "id", "w", 5, "rs1")
          .collect().groupBy(_.getString(0))
          .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      assert(latest() == batchOn(all.take(50)))
      mem.addData(all.drop(50): _*)
      q.processAllAvailable()
      assert(latest() == batchOn(all))
    } finally q.stop()
  }

  test("streaming CDC latest-wins state == batch Cdc.latestWins") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventPipeline.Change]
    val q = EventPipeline.latestWinsStream(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      // batch 1: two keys; batch 2: an older change (must NOT win), a
      // newer one, a seq tie (payload breaks it), and a delete-winner
      mem.addData(
        EventPipeline.Change(1L, 10L, "U", 1.0),
        EventPipeline.Change(2L, 5L, "U", 2.0))
      q.processAllAvailable()
      mem.addData(
        EventPipeline.Change(1L, 9L, "U", 99.0),  // stale — ignored
        EventPipeline.Change(2L, 5L, "U", 7.0),   // tie on seq, bigger payload
        EventPipeline.Change(3L, 1L, "D", 0.0))
      q.processAllAvailable()
      // the last emitted row per key is the stream's current winner
      val emitted = spark.table("cdc_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3)))
      val streamed = emitted.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1).values.toSet

      val all = Seq((1L, 10L, "U", 1.0), (2L, 5L, "U", 2.0),
        (1L, 9L, "U", 99.0), (2L, 5L, "U", 7.0), (3L, 1L, "D", 0.0))
      val batch = graft.operators.Cdc.latestWins(
        all.toDF("k", "seq", "op", "payload"), Seq("k"), "seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 10L, "U", 1.0), (2L, 5L, "U", 7.0),
        (3L, 1L, "D", 0.0)))
      // the stale row produced no emission for key 1 in batch 2
      assert(emitted.count(_._1 == 1L) == 1)
    } finally q.stop()
  }

  test("streaming transition steps == batch Sequences.transitions") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(19)
    val types = Array("view", "click", "purchase")
    // per-user in-order timelines, including ms ties broken by event_id
    val evs = (1 to 120).map { i =>
      EventPipeline.SeqEvent(
        user_id = rnd.nextInt(6).toLong,
        ms = (i / 3) * 100L, // frequent cross-user and same-user ties
        event_id = i.toLong,
        event_type = types(rnd.nextInt(3)))
    }
    val mem = MemoryStream[EventPipeline.SeqEvent]
    val q = EventPipeline.transitionsStream(mem.toDS())
      .writeStream.format("memory").queryName("steps_out")
      .outputMode("append").start()
    val got = try {
      // arbitrary micro-batch boundaries, event-time order preserved
      // across batches (the documented equivalence contract); WITHIN a
      // batch, scrambled order — the per-batch sort must fix it
      evs.grouped(37).foreach { chunk =>
        mem.addData(rnd.shuffle(chunk): _*)
        q.processAllAvailable()
      }
      spark.table("steps_out")
        .groupBy("src_type", "dst_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    } finally q.stop()
    val batch = graft.operators.Sequences.transitions(
        evs.toDF(), "user_id", "event_type", "ms", Seq("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch)
    // every user contributes (events - 1) steps
    assert(got.values.sum == evs.size - evs.groupBy(_.user_id).size)
  }

  test("streaming sessionization == batch gaps-and-islands (minus open)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(23)
    val gap = 1000L
    // per-user in-order timelines with genuine gaps: step 0..3×gap/2
    var clock = Map.empty[Long, Long].withDefaultValue(0L)
    val evs = (1 to 160).map { i =>
      val u = rnd.nextInt(5).toLong
      clock += u -> (clock(u) + (rnd.nextDouble() * 1.5 * gap).toLong + 1)
      EventPipeline.SessEvent(u, clock(u), i.toLong)
    }
    val mem = MemoryStream[EventPipeline.SessEvent]
    val q = EventPipeline.sessionsStream(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    val got = try {
      evs.grouped(41).foreach { chunk =>
        mem.addData(rnd.shuffle(chunk): _*)
        q.processAllAvailable()
      }
      spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    } finally q.stop()
    // batch reference: sequential walk per user; drop each user's LAST
    // session (still open in the stream's state by construction)
    val want = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sessions = Seq.newBuilder[(Long, Int, Long, Long, Long)]
      var (sid, start, end, n) = (0, 0L, -10 * gap, 0L)
      es.sortBy(e => (e.ms, e.event_id)).foreach { e =>
        if (e.ms - end > gap) {
          if (sid > 0) sessions += ((u, sid, n, start, end))
          sid += 1; start = e.ms; n = 0L
        }
        end = e.ms; n += 1
      }
      sessions.result() // the open session is never added
    }.toSet
    assert(got == want)
    assert(got.nonEmpty && got.size > 20) // gaps actually occurred
  }

  test("stateless curation ops run unchanged on a stream == batch") {
    // redaction (native expression), language-ID, and hash splits are
    // narrow projections, so the SAME column code serves batch and
    // streaming ingest — no twin needed, just proof it holds
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Seq(
      (1L, "the secret key of the order"),
      (2L, "el perro de la casa y los gatos"),
      (3L, "no banned words here at all"))
    val bl = Seq("secret", "key", "order")

    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.hashSplit(
        df.select(col("doc_id"),
          graft.functions.TextFunctions.redact(col("text"), bl).as("clean"),
          graft.functions.TextFunctions.redactCount(col("text"), bl).as("n_red"),
          graft.functions.TextFunctions.langId(col("text")).as("lang_pred")),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.1), "s1")

    val mem = MemoryStream[(Long, String)]
    val q = curate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    val got = try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      spark.table("curated_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
          r.getString(5))).toSet
    } finally q.stop()
    val batch = curate(spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getString(5))).toSet
    assert(got == batch)
    assert(got.exists(_._3 > 0)) // masking actually fired
  }

  test("row-local quality gate runs on a stream, converges to batch") {
    // QualityCheck's fused row-local pass is ONE aggregate — exactly the
    // shape Structured Streaming can maintain incrementally (complete
    // mode): a live data-quality dashboard over an ingest stream
    import graft.operators.QualityCheck
    import graft.operators.QualityCheck._
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val constraints = Seq(
      NotNull("k"),
      InRange("v", 0.0, 10.0),
      Satisfies("v_pos", col("v") > 0))
    val rows = Seq((Option(1L), Option(5.0)), (Option(2L), Option(50.0)),
      (None, Option(-1.0)), (Option(4L), None))
    val mem = MemoryStream[(Option[Long], Option[Double])]
    val q = QualityCheck.report(mem.toDF().toDF("k", "v"), constraints)
      .writeStream.format("memory").queryName("qc_out")
      .outputMode("complete").start()
    val got = try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*) // violations arrive incrementally
      q.processAllAvailable()
      spark.table("qc_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    } finally q.stop()
    val batch = QualityCheck
      .report(spark.createDataFrame(rows).toDF("k", "v"), constraints)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    assert(got("satisfies(v_pos)") == 2L) // -1.0 fails, NULL unprovable
  }

  test("streaming Count-Min sketch converges to the batch sketch, bit-exact") {
    // CMS is linear (counter matrices add), so a complete-mode streaming
    // build must END at exactly the batch sketch — a stronger contract
    // than the HLL twin could ever offer
    import graft.operators.Sketches
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 300).map(i => (s"g${i % 2}", s"v${i % 17}"))
    val mem = MemoryStream[(String, String)]
    val q = Sketches.freqSketch(mem.toDF().toDF("g", "v"), Seq("g"), "v")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    val got = try {
      mem.addData(rows.take(100): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(100): _*)
      q.processAllAvailable()
      spark.table("cms_out").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    } finally q.stop()
    val batch = Sketches
      .freqSketch(spark.createDataFrame(rows).toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == batch.keySet)
    batch.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, got(g)), s"group $g differs")
    }
  }

  test("streaming bitmap and KMV segment builds end at the batch " +
      "state, bit-exact") {
    // both aggregates are pure SET functions (add is idempotent, merge
    // is union / k-smallest-of-union), so a complete-mode streaming
    // build over any micro-batch slicing must end at exactly the batch
    // result — same contract family as the CMS twin above
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 400).map(i => (s"g${i % 3}", (i % 120).toLong))
    val mem = MemoryStream[(String, Long)]
    val agg = mem.toDF().toDF("g", "id").groupBy("g").agg(
      graft.functions.BitmapAggBytes.bitmapBytes(col("id")).as("bm"),
      graft.functions.KmvSketchAgg.kmvSketch(col("id"), 32).as("sk"))
    val q = agg.writeStream.format("memory").queryName("bitmap_out")
      .outputMode("complete").start()
    val got = try {
      mem.addData(rows.take(150): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(150): _*)
      q.processAllAvailable()
      spark.table("bitmap_out").collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Array[Byte]](1).toSeq, r.getSeq[Long](2)))).toMap
    } finally q.stop()
    val batch = spark.createDataFrame(rows).toDF("g", "id").groupBy("g")
      .agg(graft.functions.BitmapAggBytes.bitmapBytes(col("id")).as("bm"),
        graft.functions.KmvSketchAgg.kmvSketch(col("id"), 32).as("sk"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Array[Byte]](1).toSeq, r.getSeq[Long](2)))).toMap
    assert(got == batch)
  }

  test("drift monitor stream: each trigger's report equals the batch PSI " +
      "over the rows seen so far") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refRows = Seq(1L, 1L, 1L, 2L, 2L, 9L)   // bin 9 never streams
    val live1 = Seq(1L, 2L, 2L)
    val live2 = Seq(2L, 5L)                      // bin 5 is brand-new
    val reference = spark.createDataFrame(refRows.map(Tuple1(_)))
      .toDF("v").groupBy(col("v").as("bin"))
      .agg(count(lit(1)).as("n_ref"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    var last: Set[(Long, Long, Long, Option[Double])] = Set.empty
    val mem = MemoryStream[Long]
    val q = EventPipeline.driftMonitorStream(mem.toDF().toDF("v"),
      col("v"), reference) { (df, _) => last = df.collect().map(key).toSet }
    try {
      mem.addData(live1: _*)
      q.processAllAvailable()
      val mid = last
      val batchMid = graft.operators.Stats.psi(
        spark.createDataFrame(refRows.map((_, true)) ++
          live1.map((_, false))).toDF("v", "a"), col("v"), col("a"))
        .collect().map(key).toSet
      assert(mid == batchMid)
      mem.addData(live2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batchAll = graft.operators.Stats.psi(
      spark.createDataFrame(refRows.map((_, true)) ++
        (live1 ++ live2).map((_, false))).toDF("v", "a"),
      col("v"), col("a"))
      .collect().map(key).toSet
    assert(last == batchAll)
    // the one-sided bins surface with NULL terms, not smoothing
    assert(last.exists(r => r._1 == 9L && r._4.isEmpty))
    assert(last.exists(r => r._1 == 5L && r._4.isEmpty))
  }

  test("streaming Holt fold over micro-batches == batch holt, exact") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val pts = for (k <- Seq("a", "b", "c"); t <- 1L to 40L)
      yield EventPipeline.SeriesPoint(k, t, rnd.nextInt(10000).toLong)
    val mem = MemoryStream[EventPipeline.SeriesPoint]
    val q = EventPipeline.holtStream(mem.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    val got = try {
      // ord-respecting micro-batch splits, scrambled WITHIN each batch
      pts.groupBy(_.key).values.toSeq.flatten
        .sortBy(_.ord).grouped(17).foreach { chunk =>
          mem.addData(rnd.shuffle(chunk): _*)
          q.processAllAvailable()
        }
      spark.table("holt_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(3), r.getDouble(4))).toMap
    } finally q.stop()
    val batch = graft.operators.TimeSeries.holt(
        pts.toDF("key", "ord", "x"), Seq("key"), "ord", col("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(got == batch) // EXACT double equality — same fold, same order
  }

  test("indexMaintainStream: CDC fold over the standing k-NN graph == " +
      "the same batch CRUD fold, bit-equal edges; caches bounded") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val A = graft.operators.AnnSearch
    val (k, ef, rounds, nEntries) = (10, 10, 2, 10)
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .persist()
    val initVecs = e.filter(col("id") % 7 =!= 0)
      .select(col("id").as("b_id"), col("vec").as("b_v"))
      .localCheckpoint()
    val g0 = A.knnGraph(initVecs, k = k, iters = 1, buildK = k)
    val arriving = e.filter(col("id") % 7 === 0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val (add1, add2) = arriving.splitAt(arriving.length / 2)
    val del1 = e.filter(col("id") % 7 =!= 0 && col("id") % 13 === 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    // batch 2 also retracts-and-re-inserts one batch-1 arrival: the
    // takedown-then-replace shape (delete folds first within a batch)
    val replaced = add1.head
    val batches: Seq[Seq[(String, Long)]] = Seq(
      add1.map("insert" -> _) ++ del1.map("delete" -> _),
      add2.map("insert" -> _) ++ Seq("delete" -> replaced,
        "insert" -> replaced))

    val mem = MemoryStream[(String, Long)]
    val changes = mem.toDF().toDF("op", "id").join(e, Seq("id"), "left")
    def edgeSet(g: org.apache.spark.sql.DataFrame) =
      g.select("a_id", "nbr_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    var streamed = Set.empty[(Long, Long, Int)]
    var registryAfterB1 = Int.MaxValue
    val q = graft.streaming.EventPipeline.indexMaintainStream(
      g0, initVecs, changes, "op", "id", "vec", k, ef, rounds,
      nEntries) { (edges, _) => streamed = edgeSet(edges) }
    try {
      mem.addData(batches(0): _*); q.processAllAvailable()
      registryAfterB1 = spark.sparkContext.getPersistentRDDs.size
      mem.addData(batches(1): _*); q.processAllAvailable()
      // superseded state blocks must be swept, not accrued per trigger
      assert(spark.sparkContext.getPersistentRDDs.size
        <= registryAfterB1 + 2, "cache registry grew across triggers")
    } finally q.stop()

    // the batch twin: the same fold sequence through the CRUD duals
    var (g, v) = (g0, initVecs)
    batches.foreach { b =>
      val dels = b.collect { case ("delete", i) => i }
      val adds = b.collect { case ("insert", i) => i }
      if (dels.nonEmpty) {
        g = A.retractFromKnnGraph(g, dels.toDF("id"), "id")
          .localCheckpoint()
        v = v.join(dels.toDF("b_id"), Seq("b_id"), "left_anti")
          .localCheckpoint()
      }
      if (adds.nonEmpty) {
        val av = e.join(adds.toDF("id"), "id")
        g = A.addToKnnGraph(g, v, av, "id", "vec", k, ef, rounds,
          nEntries)
        v = v.unionByName(av.select(col("id").as("b_id"),
          col("vec").as("b_v"))).localCheckpoint()
      }
    }
    val want = edgeSet(g)
    assert(streamed == want && want.nonEmpty,
      s"stream fold diverged: ${streamed.size} vs ${want.size} edges")
    // the replaced id is live again (it was re-inserted after takedown)
    assert(streamed.exists(_._1 == replaced))
    e.unpersist()
  }

  test("indexMaintainStreamLayered: per-level CDC fold == the same " +
      "batch fold — promoted inserts join the layer, deletes tombstone") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val A = graft.operators.AnnSearch
    val (k, ef, rounds, nEntries) = (10, 10, 2, 10)
    val div = 4L // dense promotion so the fixture layer is non-trivial
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .persist()
    val initVecs = e.filter(col("id") % 7 =!= 0)
      .select(col("id").as("b_id"), col("vec").as("b_v"))
      .localCheckpoint()
    val g0 = A.knnGraph(initVecs, k = k, iters = 1, buildK = k)
    val l1b0 = initVecs.filter(A.layerPromoted(col("b_id"), div))
    val l1g0 = A.knnGraph(l1b0, k = k, iters = 1, buildK = k)
    val arriving = e.filter(col("id") % 7 === 0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val (add1, add2) = arriving.splitAt(arriving.length / 2)
    val del1 = e.filter(col("id") % 7 =!= 0 && col("id") % 13 === 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    val replaced = add1.head
    val batches: Seq[Seq[(String, Long)]] = Seq(
      add1.map("insert" -> _) ++ del1.map("delete" -> _),
      add2.map("insert" -> _) ++ Seq("delete" -> replaced,
        "insert" -> replaced))
    val mem = MemoryStream[(String, Long)]
    val changes = mem.toDF().toDF("op", "id").join(e, Seq("id"), "left")
    def edgeSet(g: org.apache.spark.sql.DataFrame) =
      g.select("a_id", "nbr_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    var sBase = Set.empty[(Long, Long, Int)]
    var sLayer = Set.empty[(Long, Long, Int)]
    val q = graft.streaming.EventPipeline.indexMaintainStreamLayered(
      g0, initVecs, Seq((div, l1g0)), changes, "op", "id", "vec",
      k, ef, rounds, nEntries) { (base, lvls, _) =>
      sBase = edgeSet(base); sLayer = edgeSet(lvls.head)
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // the batch twin: base fold as in the flat stream; the layer folds
    // deletes always and only PROMOTED inserts, against the promoted
    // slice of the maintained vector table
    var (g, v, lg) = (g0, initVecs, l1g0)
    batches.foreach { b =>
      val dels = b.collect { case ("delete", i) => i }
      val adds = b.collect { case ("insert", i) => i }
      if (dels.nonEmpty) {
        g = A.retractFromKnnGraph(g, dels.toDF("id"), "id")
          .localCheckpoint()
        lg = A.retractFromKnnGraph(lg, dels.toDF("id"), "id")
          .localCheckpoint()
        v = v.join(dels.toDF("b_id"), Seq("b_id"), "left_anti")
          .localCheckpoint()
      }
      if (adds.nonEmpty) {
        val av = e.join(adds.toDF("id"), "id")
        g = A.addToKnnGraph(g, v, av, "id", "vec", k, ef, rounds,
          nEntries)
        val pav = av.filter(A.layerPromoted(col("id"), div))
        if (!pav.isEmpty)
          lg = A.addToKnnGraph(lg,
            v.filter(A.layerPromoted(col("b_id"), div)),
            pav, "id", "vec", k, ef, rounds, nEntries)
        v = v.unionByName(av.select(col("id").as("b_id"),
          col("vec").as("b_v"))).localCheckpoint()
      }
    }
    assert(sBase == edgeSet(g) && sBase.nonEmpty, "base fold diverged")
    assert(sLayer == edgeSet(lg) && sLayer.nonEmpty, "layer fold diverged")
    // a promoted arrival actually reached the layer, and a deleted
    // promoted id actually left it (the maintenance is not vacuous)
    val promotedArrivals = e.filter(col("id") % 7 === 0)
      .filter(A.layerPromoted(col("id"), div))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(promotedArrivals.exists(i => sLayer.exists(_._1 == i)),
      "no promoted insert reached the layer graph")
    val promotedDeleted = del1.toSet.intersect(
      e.filter(A.layerPromoted(col("id"), div))
        .select("id").collect().map(_.getLong(0)).toSet)
    assert(promotedDeleted.nonEmpty, "fixture never deletes a promoted id")
    assert(promotedDeleted.forall(i =>
      !sLayer.exists(t => t._1 == i || t._2 == i)),
      "a deleted promoted id still serves from the layer")
    e.unpersist()
  }
}
