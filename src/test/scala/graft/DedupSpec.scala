package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").persist()

  test("native shingles == declarative shingles (as sets)") {
    val both = docs.select(
      TextFunctions.shingles(col("text"), 3).as("fast"),
      TextFunctions.shinglesDeclarative(col("text"), 3).as("slow"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet)
      assert(r.getSeq[String](0).length == r.getSeq[String](1).length)
    }
    // short-doc guard: fewer tokens than n -> empty, not bogus window
    val short = spark.createDataFrame(Seq(Tuple1("one two"))).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
    // trailing/leading-separator docs: native must keep empty tokens exactly
    // like the declarative twin (Spark split limit -1 / DuckDB string_split)
    val edge = spark.createDataFrame(
      Seq(Tuple1("a b c  d "), Tuple1(" a b"), Tuple1("a  "))).toDF("text")
      .select(
        TextFunctions.shingles(col("text"), 3).as("fast"),
        TextFunctions.shinglesDeclarative(col("text"), 3).as("slow"))
      .collect()
    edge.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} declarative=${r.getSeq[String](1)}")
    }
  }

  test("jaccardJoin == brute-force jaccard over collected shingle sets") {
    val eng = Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sets = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val exp = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter) if jac >= 0.5
    } yield (a, b) -> jac).toMap
    assert(eng == exp)
    assert(exp.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("jaccardJoinPrefix == jaccardJoin (prefix filter is lossless)") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        BigDecimal(r.getDouble(2)).setScale(12, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val fast = key(Dedup.jaccardJoin(docs, "doc_id", "text", 3, t))
      val pfx = key(Dedup.jaccardJoinPrefix(docs, "doc_id", "text", 3, t))
      assert(pfx == fast, s"divergence at threshold $t")
    }
  }

  test("threshold-boundary pairs survive the length and prefix filters") {
    // jac exactly == t with fl(t·sz) one ulp ABOVE the exact product
    // (0.07·100 → 7.000000000000001): a mn >= t*mx length filter or a
    // ceil(t*sz) prefix length would silently drop the pair
    val a = (1 to 100).map(i => s"w$i").mkString(" ")      // 98 3-shingles
    val b = (1 to 9).map(i => s"w$i").mkString(" ")        // 7, all in a
    val docs2 = spark.createDataFrame(Seq((1L, a), (2L, b)))
      .toDF("doc_id", "text")
    // shingle sizes: a=98, b=7; inter=7 -> jac = 7/98 = 0.07142857...
    val t = 7.0 / 98.0 // exactly representable as the same double the
                       // engine computes -> pair sits ON the threshold
    for ((name, df) <- Seq(
        "jaccardJoin" -> Dedup.jaccardJoin(docs2, "doc_id", "text", 3, t),
        "jaccardJoinPrefix" ->
          Dedup.jaccardJoinPrefix(docs2, "doc_id", "text", 3, t))) {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)), s"$name dropped the boundary pair")
    }
  }

  test("minHashJoin recalls every exact-jaccard pair (verified output)") {
    val exact = Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashJoin(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // verification makes precision exact; bands give recall
  }

  test("incremental minHashJoinAgainst == full rebuild's cross pairs") {
    // split the corpus: even ids are the indexed store, odd the batch
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val index = Dedup.minHashIndex(old, "doc_id", "text", 3)
    val got = Dedup.minHashJoinAgainst(index, fresh, "doc_id", "text", 3, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // full rebuild over old ∪ new, restricted to cross pairs and
    // reoriented (new, old)
    val full = Dedup.minHashJoin(docs, "doc_id", "text", 3, 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val want = full.collect {
      case ((a, b), j) if a % 2 == 1 && b % 2 == 0 => (a, b) -> j
      case ((a, b), j) if a % 2 == 0 && b % 2 == 1 => (b, a) -> j
    }.toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture produced no cross-split near-dups")
    // within-batch duplicates are out of contract: nothing emitted twice
    assert(got.keySet.forall { case (n, o) => n % 2 == 1 && o % 2 == 0 })
  }

  test("minHashIndex parquet round-trip serves identical results") {
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("minhash_idx").toString
    Dedup.minHashIndex(old, "doc_id", "text", 3)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fromStore =
      Dedup.minHashJoinAgainst(stored, fresh, "doc_id", "text", 3, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val fromFresh = Dedup.minHashJoinAgainst(
        Dedup.minHashIndex(old, "doc_id", "text", 3),
        fresh, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(fromStore == fromFresh && fromStore.nonEmpty)
  }

  test("appendToIndex == minHashIndex over old ∪ new, and the grown " +
      "store serves both generations") {
    val old = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val probe = docs.filter(col("doc_id") % 3 === 2)
    def idxRows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList,
        r.getSeq[Long](2).toSet)).toSet
    val grown = Dedup.appendToIndex(
      Dedup.minHashIndex(old, "doc_id", "text", 3), batch,
      "doc_id", "text", 3)
    // append IS the rebuild over the union, bit for bit
    assert(idxRows(grown) ==
      idxRows(Dedup.minHashIndex(docs.filter(col("doc_id") % 3 =!= 2),
        "doc_id", "text", 3)))
    val hits = Dedup.minHashJoinAgainst(grown, probe, "doc_id", "text",
      3, 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.nonEmpty && hits.forall(_._1 % 3 == 2))
    // matches land in BOTH generations of the store
    assert(hits.exists(_._2 % 3 == 0) && hits.exists(_._2 % 3 == 1),
      "fixture never matched one of the store generations")
  }

  test("embedding near-dup: LSH candidates recall most exact pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .persist()
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 0.4,
      nPlanes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // precision exact by verification
    if (exact.nonEmpty) {
      val recall = exact.count(lsh.contains).toDouble / exact.size
      assert(recall >= 0.6, s"hyperplane-LSH recall $recall over ${exact.size}")
    }
    emb.unpersist()
  }

  test("exact dedup keeps min id per identical text") {
    val withDups = docs.select("doc_id", "text").union(
      docs.filter(col("doc_id") < 5).select(col("doc_id") + 10000, col("text")))
    val kept = Dedup.exact(withDups, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == docs.collect().map(_.getLong(0)).toSet) // originals win
  }

  test("simHashJoin maxHamming=0 finds exactly the identical fingerprints") {
    // width = 64: the band key must be the whole fingerprint — the mask
    // formula (1L << 64) - 1 would be 0 on the JVM and every doc would
    // collide into one bucket (silent cross join)
    val h = spark.createDataFrame(Seq(
        (1L, 42L), (2L, 42L), (3L, 43L), (4L, -7L), (5L, -7L), (6L, 42L)))
      .toDF("id", "simhash")
    val got = Dedup.simHashJoin(h, maxHamming = 0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 6L), (2L, 6L), (4L, 5L)))
  }

  test("simHash: identical docs collide, near-dup pairs within hamming radius") {
    val hashes = Dedup.simHash(docs, "doc_id", "text").persist()
    // identical text -> identical simhash (determinism)
    val h2 = Dedup.simHash(docs, "doc_id", "text")
    assert(hashes.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      h2.collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    // the PLANTED near-dup pairs (high 3-gram jaccard = same word
    // sequences, few edits) must land within a small hamming radius
    val nearDup = Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearDup.nonEmpty, "fixture should contain planted near-dups")
    val sim = Dedup.simHashJoin(hashes, maxHamming = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = nearDup.count(sim.contains).toDouble / nearDup.size
    assert(recall >= 0.8, s"simhash recall $recall over ${nearDup.size} pairs")
    hashes.unpersist()
  }

  test("decontaminate counts shared n-grams and flags overlapping docs") {
    val bench = spark.createDataFrame(Seq(
      (100L, "alpha beta gamma delta"))).toDF("doc_id", "text")
    val train = spark.createDataFrame(Seq(
      // shares "alpha beta gamma" AND "beta gamma delta" with bench
      (1L, "alpha beta gamma delta epsilon"),
      // shares exactly one 3-gram
      (2L, "zeta alpha beta gamma"),
      // no overlap
      (3L, "one two three four"),
      // too short for any 3-gram
      (4L, "alpha beta"))).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      1L -> ((2L, true)), 2L -> ((1L, true)),
      3L -> ((0L, false)), 4L -> ((0L, false))))
  }

  test("noveltyReport == scala first-occurrence attribution") {
    val got = Dedup.noveltyReport(docs, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val sets = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      .toMap
    val firstOwner = sets.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupMapReduce(_._1)(_._2)(math.min)
    assert(got.keySet == sets.filter(_._2.nonEmpty).keySet)
    for ((id, ss) <- sets if ss.nonEmpty) {
      val novel = ss.count(firstOwner(_) == id)
      val (n, nv, ratio) = got(id)
      assert(n == ss.size, s"doc $id n_shingles")
      assert(nv == novel, s"doc $id n_novel")
      assert(math.abs(ratio - novel.toDouble / ss.size) < 1e-6)
    }
    // the min-id doc of any duplicated shingle owns it; later docs don't
    val dup = spark.createDataFrame(Seq(
      (10L, "a b c d"), (20L, "a b c z"), (30L, "a b c d")))
      .toDF("doc_id", "text")
    val r = Dedup.noveltyReport(dup, "doc_id", "text", 3).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r == Map(10L -> 2L, 20L -> 1L, 30L -> 0L))
  }

  test("dupGroups closes pairs transitively with a min-id canonical") {
    val pairs = spark.createDataFrame(Seq(
      (2L, 5L), (5L, 9L),   // chain: {2,5,9} -> canonical 2
      (3L, 7L)              // {3,7} -> canonical 3
    )).toDF("a_id", "b_id")
    val ids = spark.createDataFrame(
      Seq(1L, 2L, 3L, 5L, 7L, 9L).map(Tuple1(_))).toDF("doc_id")
    val got = Dedup.dupGroups(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      1L -> ((1L, true)),  // singleton survives as itself
      2L -> ((2L, true)), 5L -> ((2L, false)), 9L -> ((2L, false)),
      3L -> ((3L, true)), 7L -> ((3L, false))))
  }

  test("retractDocs: bridge loss splits the group, canonical re-keys, " +
      "untouched groups byte-identical == from-scratch rebuild") {
    // texts engineered so jaccard(3-shingles) links A~B~C in a CHAIN
    // through bridge B (A~C alone are below threshold), plus an
    // unrelated pair {D, E} and a singleton F
    val mk = (words: Seq[String]) => words.mkString(" ")
    val common1 = (1 to 8).map(i => s"alpha$i")
    val common2 = (1 to 8).map(i => s"beta$i")
    val corpus = Seq(
      1L -> mk(common1 :+ "enda"),                 // A: shares c1 with B
      2L -> mk(common1 ++ common2),                // B: bridge (c1 + c2)
      3L -> mk(common2 :+ "endc"),                 // C: shares c2 with B
      4L -> mk((1 to 9).map(i => s"gamma$i")),     // D ~ E
      5L -> mk((1 to 9).map(i => s"gamma$i") :+ "tail"),
      6L -> mk((1 to 9).map(i => s"delta$i")))     // F singleton
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val pairsOf = (d: org.apache.spark.sql.DataFrame) =>
      Dedup.jaccardJoin(d, "doc_id", "text", 3, 0.3)
    val groups = Dedup.dupGroups(pairsOf(docs), docs, "doc_id")
    // sanity: the chain closed through the bridge
    val g0 = groups.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g0(1L) == 1L && g0(2L) == 1L && g0(3L) == 1L, g0)
    assert(g0(4L) == 4L && g0(5L) == 4L && g0(6L) == 6L, g0)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // removing the bridge (also the canonical here) splits {1,2,3}
    // into singletons {1} and {3} — both re-keyed to themselves
    val rm = spark.createDataFrame(Seq(Tuple1(2L))).toDF("doc_id")
    val after = asMap(Dedup.retractDocs(groups, docs, rm, "doc_id", pairsOf))
    val survivors = docs.filter(col("doc_id") =!= 2L)
    val scratch = asMap(Dedup.dupGroups(pairsOf(survivors), survivors,
      "doc_id"))
    assert(after == scratch, s"after=$after\nscratch=$scratch")
    assert(after(1L) == ((1L, true)) && after(3L) == ((3L, true)), after)
    assert(after(4L) == ((4L, true)) && after(5L) == ((4L, false)),
      "untouched group must pass through unchanged")
    // removing a NON-canonical, non-bridge member re-keys nothing else
    val rm2 = spark.createDataFrame(Seq(Tuple1(5L))).toDF("doc_id")
    val after2 = asMap(Dedup.retractDocs(groups, docs, rm2, "doc_id",
      pairsOf))
    val survivors2 = docs.filter(col("doc_id") =!= 5L)
    assert(after2 == asMap(Dedup.dupGroups(pairsOf(survivors2),
      survivors2, "doc_id")))
    // absent ids are a no-op
    val rm3 = spark.createDataFrame(Seq(Tuple1(777L))).toDF("doc_id")
    assert(asMap(Dedup.retractDocs(groups, docs, rm3, "doc_id", pairsOf))
      == asMap(groups))
  }

  test("retractFromIndex == index rebuilt over survivors (bit-equal); " +
      "probes cannot match retracted docs") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon eta"),
      (6L, "one two three four five six seven"),
      (8L, "totally different words here again now"))
    val docs = corpus.toDF("doc_id", "text")
    val idx = Dedup.minHashIndex(docs, "doc_id", "text", 3)
    val rm = Seq(4L, 6L).toDF("doc_id")
    val after = Dedup.retractFromIndex(idx, rm, "doc_id")
    val rebuilt = Dedup.minHashIndex(
      docs.filter(!col("doc_id").isin(4L, 6L)), "doc_id", "text", 3)
    // per-doc rows: retraction IS the rebuild, bit for bit (sorted
    // token arrays compared as full rows)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("sig"), array_sort(col("toks")).as("toks"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows(after) == rows(rebuilt))
    // a probe near-identical to a RETRACTED doc finds nothing; one
    // near a surviving doc still matches
    val probe = Seq((11L, "alpha beta gamma delta epsilon zeta")).toDF(
      "doc_id", "text")
    val hits = Dedup.minHashJoinAgainst(after, probe, "doc_id", "text",
      3, 0.3).collect().map(r => r.getLong(1)).toSet
    assert(hits == Set(2L), s"hits=$hits — 4 was retracted, 2 survives")
  }

  test("decontaminateBloom == decontaminate (bloom FPs removed exactly)") {
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
    val exact = collectMap(Dedup.decontaminate(train, bench, "doc_id", "text", 3))
    // a deliberately high fpp stresses the exact-verification join
    val bloom = collectMap(
      Dedup.decontaminateBloom(train, bench, "doc_id", "text", 3, fpp = 0.2))
    assert(bloom == exact)
  }

  test("containmentJoin: quoted-whole doc is Jaccard-invisible but caught") {
    val small = "alpha beta gamma delta epsilon" // 3 shingles
    val big = small + " zeta eta theta iota kappa lambda" // 9 shingles
    val d = spark.createDataFrame(Seq((1L, small), (2L, big), (3L, "x y z w")))
      .toDF("doc_id", "text")
    // jaccard = 3/9 — under a 0.5 dedup threshold the pair is invisible
    assert(Dedup.jaccardJoin(d, "doc_id", "text", 3, 0.5).count() == 0)
    val r = Dedup.containmentJoin(d, "doc_id", "text", 3, 0.8).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    assert(row.getLong(2) == 3L)          // inter
    assert(row.getDouble(3) == 1.0)       // cont_a: all of A inside B
    assert(row.getDouble(4) == 3.0 / 9.0) // cont_b
  }

  test("containmentJoin == brute force over shingle sets on the corpus") {
    val sh = docs
      .select(col("doc_id"),
        TextFunctions.shingles(col("text"), 3).as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (a, ta) <- sh; (b, tb) <- sh if a < b
      inter = (ta & tb).size.toLong
      ca = inter.toDouble / ta.size; cb = inter.toDouble / tb.size
      if math.max(ca, cb) >= 0.6
    } yield (a, b) -> ((inter, ca, cb))).toMap
    val got = Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == want)
  }

  test("crossDocShared: shared spans counted, unique docs at 0, short docs out") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d e"),   // grams: "a b c", "b c d", "c d e"
      (2L, "x y a b c d"), // shares "a b c" and "b c d" with doc 1
      (3L, "p q r s"),     // no overlap
      (4L, "t u")))        // too short for 3-grams
      .toDF("doc_id", "text")
    val got = Dedup.crossDocShared(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 2L, 0.666667)))
    assert(got(2L) == ((4L, 2L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(!got.contains(4L))
  }

  test("crossDocShared: repeats within ONE doc are not 'shared'") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b a b a b"), // "a b a"/"b a b" repeat only within doc 1
      (2L, "c d e f")))
      .toDF("doc_id", "text")
    val got = Dedup.crossDocShared(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  test("semDedup == the smaller-id drop rule, scoped to clusters") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .persist()
    val asg = graft.operators.KMeans.fit(emb, "vec_id", "embedding", 8, 3)
    val got = Dedup.semDedup(emb, "vec_id", "embedding", asg, 0.4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2)))
      .toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cid = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Array[Float], bb: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * bb(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += bb(i).toDouble * bb(i).toDouble
        i += 1
      }
      dp / math.sqrt(na * nb)
    }
    assert(got.size == vecs.size)
    var drops = 0
    for ((id, (c, kept)) <- got) {
      assert(c == cid(id))
      val expKept = !vecs.keys.exists(j => j < id && cid(j) == c &&
        cos(vecs(id), vecs(j)) >= 0.4)
      assert(kept == expKept, s"id $id")
      if (!kept) drops += 1
    }
    assert(drops > 0, "fixture should drop at least one near-dup")
    // each cluster's minimal id can never have a smaller-id neighbor
    got.groupBy(_._2._1).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._2._2, "cluster minimum must be kept")
    }
    emb.unpersist()
  }

  test("semDedup: cross-cluster near-dups survive (scoping contract)") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), // same direction
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val asg = Seq((1L, 0), (2L, 1), (3L, 1)).toDF("vec_id", "cluster")
    val kept = Dedup.semDedup(pts, "vec_id", "embedding", asg, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // 1 and 2 are identical but in DIFFERENT clusters — both survive
    assert(kept == Map(1L -> true, 2L -> true, 3L -> true))
    val one = Seq((1L, 0), (2L, 0), (3L, 0)).toDF("vec_id", "cluster")
    val kept2 = Dedup.semDedup(pts, "vec_id", "embedding", one, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept2 == Map(1L -> true, 2L -> false, 3L -> true))
  }
}
