package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.api.{Dedup, Pipeline, Sim}

/** Top-level for Encoder derivation (no outer-scope capture). */
case class Doc(doc_id: Long, text: String, lang: String)

/** Top-level for Encoder derivation (no outer-scope capture). */
case class Vec(vec_id: Long, embedding: Array[Float])

/** The public `graft.api` operators at NON-default parameters — the
  * oracle gate (Verify + compare.py) pins the default paths through the
  * q_* wrappers; this suite pins the parameterized behavior and the
  * properties the docs promise (determinism, recall guarantees,
  * streamability of the map-side operators). */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    Doc(1L, "a b c d e f g h", "en"),
    Doc(2L, "a b c d e f g h", "en"),     // exact dup of 1
    Doc(3L, "a b c d e f g X", "en"),     // near dup of 1/2
    Doc(4L, "p q r s t u v w", "fr"),
    Doc(5L, "completely different words here now ok yes", "fr")
  ).toDF()

  test("sampleStratified: integer thresholds, default weight, determinism") {
    val df = Seq.tabulate(1000)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val kept = Pipeline.sampleStratified(
      df, col("s"), col("id"), Map("a" -> 0.1), default = 1.0)
    val byS = kept.groupBy("s").count().as[(String, Long)].collect().toMap
    // default 1.0 keeps everything; 0.1 keeps roughly 10% (hash-uniform)
    assert(byS("b") == 500)
    assert(byS("a") > 10 && byS("a") < 150, s"got ${byS("a")}")
    // replayable: same rows on a second run
    val again = Pipeline.sampleStratified(
      df, col("s"), col("id"), Map("a" -> 0.1), default = 1.0)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
    // weight 0 keeps nothing
    assert(Pipeline.sampleStratified(
      df, col("s"), col("id"), Map.empty, default = 0.0).count() == 0)
  }

  test("splitAssign: partition of the input, stable, custom buckets") {
    val df = Seq.tabulate(200)(i => Tuple1(i.toLong)).toDF("id")
    val split = Pipeline.splitAssign(
      df, col("id"), buckets = 4, assignments = Map(0 -> "t"), "rest")
    val counts = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum == 200)          // a partition: nothing lost
    assert(counts.keySet == Set("t", "rest"))
    assert(counts("t") > 20 && counts("t") < 80) // ~1/4, hash-uniform
  }

  test("packBins honors the budget for every bin except oversized rows") {
    val df = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 600L),
                 (5L, 3000L), (6L, 100L))
      .toDF("id", "tok").withColumn("g", lit("x"))
    val binned =
      Pipeline.packBins(df, col("g"), col("id"), col("tok"), budget = 1024)
    val bins = binned.groupBy("bin").agg(sum("tok").as("s"))
      .as[(Long, Long)].collect().toMap
    // the FULL assignment, from the offset-chunking contract
    // (bin = running-offset div budget; a row STARTING inside the
    // budget window joins that bin, an oversized row is assigned where
    // it starts): offsets 0,600,1200,1800,2400,5400 → bins
    // 0,0,1,1,2,5. The old structural asserts were tautologies
    // (distinct-vs-groupBy count, input total) — review r4 test pass.
    val got = binned.select("id", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
                      5L -> 2L, 6L -> 5L), got.toString)
    // and therefore: no bin's ROW-START ever crosses its budget window,
    // the only overflow being the oversized 3000-token row itself
    assert(bins.values.sum == 5500)
  }

  test("contaminated: n-gram width dial and benchmark independence") {
    val bench = Seq(Doc(100L, "a b c d e f g h", "en")).toDF()
    // 8-gram: only the two exact copies collide with the benchmark
    val hits8 = Pipeline.contaminated(
      docs, bench, col("doc_id"), col("text"), n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(hits8.toSeq == Seq(1L, 2L))
    // 7-gram: the near-dup (shares 'a b c d e f g') joins them
    val hits7 = Pipeline.contaminated(
      docs, bench, col("doc_id"), col("text"), n = 7)
      .select("doc_id").as[Long].collect().sorted
    assert(hits7.toSeq == Seq(1L, 2L, 3L))
    // disjoint benchmark → nothing flagged
    val none = Pipeline.contaminated(
      docs, Seq(Doc(101L, "zz yy xx ww vv uu tt ss", "en")).toDF(),
      col("doc_id"), col("text"), n = 7)
    assert(none.count() == 0)
  }

  test("contaminatedBloom equals contaminated; prefilter sits in the scan stage") {
    val bench = Seq(Doc(100L, "a b c d e f g h", "en")).toDF()
    for (n <- Seq(7, 8)) {
      val exact = Pipeline.contaminated(
        docs, bench, col("doc_id"), col("text"), n)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val bloom = Pipeline.contaminatedBloom(
        docs, bench, col("doc_id"), col("text"), n, expectedItems = 64L)
      assert(bloom.select("doc_id").as[Long].collect().sorted.toSeq == exact)
      // the bloom probe must run BEFORE the confirm join (scan-stage
      // prune), not after it
      val plan = bloom.queryExecution.executedPlan.toString
      val probeAt = plan.indexOf("might_contain")
      val joinAt = plan.indexOf("Join")
      assert(probeAt >= 0, s"no bloom probe in plan:\n$plan")
      assert(joinAt >= 0 && probeAt > joinAt, // child plans print BELOW parents
        s"bloom probe not below (before) the confirm join:\n$plan")
    }
    // empty benchmark → empty result, schema preserved
    val none = Pipeline.contaminatedBloom(
      docs, bench.filter(lit(false)), col("doc_id"), col("text"), 7)
    assert(none.columns.toSeq == docs.columns.toSeq && none.count() == 0)
  }

  test("minhashPairs: wider shingles are stricter; threshold honored") {
    val loose = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      shingle = 2, minMatch = 8)
    val strict = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      shingle = 5, minMatch = 16)
    val loosePairs = loose.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    val strictPairs = strict.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    assert(loosePairs.contains((1L, 2L)))       // exact dups always pair
    assert(strictPairs.subsetOf(loosePairs))    // stricter ⊆ looser
    // all 16 slots agree only for the exact duplicates
    assert(strictPairs == Set((1L, 2L)))
  }

  test("minhashPairs fastHash: same 16-slot contract under xxhash64") {
    // the production hasher must preserve the signature CONTRACT even
    // though the hash values differ: identical docs agree on all 16
    // slots (exact dups always pair at minMatch=16), the near-dup of
    // 1/2 still pairs at the default threshold, and unrelated docs
    // never do; signatures are (k∈[0,16), mh BIGINT), one row per slot
    val fast = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      shingle = 2, minMatch = 8, fastHash = true)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fast.contains((1L, 2L)), s"$fast")
    assert(fast.contains((1L, 3L)) && fast.contains((2L, 3L)), s"$fast")
    assert(!fast.exists(p => p._1 == 5L || p._2 == 5L), s"$fast")
    val exact = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      shingle = 2, minMatch = 16, fastHash = true)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)), s"$exact")
    val sig = Dedup.minhashSignatures(docs, col("doc_id"), col("text"),
      shingle = 2, fastHash = true)
    assert(sig.schema("mh").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(sig.groupBy("doc_id").count().as[(Long, Long)]
      .collect().forall(_._2 == 16))
  }

  test("simhash fastHash: exact dups at Hamming 0, banding contract intact") {
    val pairs = Dedup.simhashHammingPairs(docs, col("doc_id"),
        col("text"), maxHamming = 3, fastHash = true)
      .as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((1L, 2L)).contains(0L), s"${pairs.toSeq}")
    // signatures remain 32-bit longs under the fast hasher
    val sig = Dedup.simhashSig32(docs, col("doc_id"), col("text"),
      fastHash = true).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig.values.forall(s => s >= 0L && s <= 0xFFFFFFFFL))
  }

  test("bandedRangeJoin: boundary-exact, cross-bucket pairs survive") {
    import spark.implicits._
    val a = Seq((1L, "u", 100L), (2L, "u", 999L), (3L, "v", 100L))
      .toDF("a_id", "ka", "a_us")
    val b = Seq(
      (10L, "u", 100L),   // gap 0 vs a1 -> excluded (strict lower bound)
      (11L, "u", 160L),   // gap 60 vs a1 -> included (inclusive upper)
      (12L, "u", 161L),   // gap 61 vs a1 -> excluded
      (13L, "u", 1030L),  // gap 31 vs a2, CROSSES the 960/1020 bucket edge
      (14L, "w", 130L)    // right key, wrong partition -> excluded
    ).toDF("b_id", "kb", "b_us")
    val got = graft.api.Events.bandedRangeJoin(
        a, b, col("ka"), col("kb"), col("a_us"), col("b_us"), 60L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L), (2L, 13L)), s"got $got")
  }

  test("minhashMatches (cross-corpus) agrees with the self-join path") {
    // batch = ids 100+, corpus = the base docs; doc 101 is an exact
    // copy of corpus doc 1, doc 102 is unrelated
    val corpus = docs
    val batch = Seq(
      Doc(101L, "a b c d e f g h", "en"),
      Doc(102L, "qq rr ss tt uu vv ww xx", "en")).toDF()
    val sigB = Dedup.minhashSignatures(batch, col("doc_id"), col("text"))
    val sigC = Dedup.minhashSignatures(corpus, col("doc_id"), col("text"))
    // every doc has exactly 16 signature slots
    val slots = sigB.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(slots.values.forall(_ == 16L), slots.toString)
    val cross = Dedup.minhashMatches(sigB, sigC, minMatch = 8)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // the exact copy matches corpus docs 1 and 2 (themselves exact
    // dups) on all 16 slots; near-dups may match on fewer (≥ 8); the
    // unrelated doc matches nothing
    assert(cross.filter(t => t._2 == 1L || t._2 == 2L)
                .map(t => (t._1, t._3)).toSet == Set((101L, 16L)))
    assert(cross.forall(_._3 >= 8L))
    assert(!cross.exists(_._1 == 102L))
    // ground truth: the union self-join restricted to cross pairs
    val unioned = Dedup.minhashPairs(
      corpus.union(batch), col("doc_id"), col("text"), minMatch = 8)
      .filter(col("doc_b") >= 100L && col("doc_a") < 100L)
      .select(col("doc_b"), col("doc_a"), col("n_match"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(cross == unioned, s"cross=$cross unioned=$unioned")
  }

  test("lineDedup drops the shared banner, rebuilds in order") {
    import graft.api.Text
    // 2-word lines; "cookie banner" is in all three docs
    val docs3 = Seq(
      Doc(1L, "cookie banner unique one content here", "en"),
      Doc(2L, "cookie banner other two words go", "en"),
      Doc(3L, "cookie banner", "en") // nothing but boilerplate
    ).toDF()
    val out = Text.lineDedup(docs3, col("doc_id"), col("text"),
        lineWords = 2, maxLineDocFreq = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "unique one content here"),
      (2L, 3L, 2L, "other two words go"),
      (3L, 1L, 0L, "")), s"got $out")
  }

  test("bandedRangeJoin rejects ambiguous and reserved column names") {
    import spark.implicits._
    val x = Seq((1L, 10L)).toDF("id", "us")
    // identical names on both sides -> ambiguous join, must fail loudly
    intercept[IllegalArgumentException] {
      graft.api.Events.bandedRangeJoin(
        x, x, col("id"), col("id"), col("us"), col("us"), 60L)
    }
    // reserved aux name would be silently clobbered -> must fail loudly
    val bad = Seq((1L, 10L, 0L)).toDF("a_id", "a_us", "__graft_bk_probe")
    val ok = Seq((2L, 20L)).toDF("b_id", "b_us")
    intercept[IllegalArgumentException] {
      graft.api.Events.bandedRangeJoin(
        bad, ok, col("a_id"), col("b_id"), col("a_us"), col("b_us"), 60L)
    }
  }

  test("containmentPairs finds the embedded quote Jaccard misses") {
    // doc 11's whole text appears inside doc 12's much longer text
    val quote = "alpha beta gamma delta epsilon zeta eta"
    val host = ("pad%d ".format(1) + (1 to 60).map(i => s"pad$i")
      .mkString(" ") + " " + quote + " " + (61 to 120)
      .map(i => s"pad$i").mkString(" "))
    val qd = Seq(
      Doc(11L, quote, "en"), Doc(12L, host, "en"),
      Doc(13L, "unrelated words entirely other content here now", "en")
    ).toDF()
    val cont = Dedup.containmentPairs(qd, col("doc_id"), col("text"),
      n = 5, minContainment = 0.9)
    val rows = cont.select("doc_a", "doc_b", "contained_doc")
      .as[(Long, Long, Long)].collect().toSet
    // the quote is fully contained -> C = 1.0, and doc 11 is the subset
    assert(rows == Set((11L, 12L, 11L)), s"got $rows")
    // Jaccard on the same pair is diluted below any usable threshold
    val jac = Dedup.jaccardPairs(qd, col("doc_id"), col("text"),
      n = 5, minJaccard = 0.2)
    assert(jac.filter(col("doc_a") === 11L && col("doc_b") === 12L)
      .isEmpty, "jaccard should miss the sub-document pair")
  }

  test("sharedNgramSpans: planted shared runs coalesce to exact spans") {
    // docs 21/22 share two DISJOINT runs: tokens 0..6 (one 5-gram
    // window exactly) and a longer 8-token run (= 4 consecutive
    // 5-gram starts) placed at different offsets in each doc; doc 23
    // shares nothing. The islands must coalesce per run, not merge
    // across the unshared gap, and positions are per-doc.
    val runA = "s1 s2 s3 s4 s5"                    // 5 tokens: 1 start
    val runB = "t1 t2 t3 t4 t5 t6 t7 t8"          // 8 tokens: 4 starts
    val d21 = s"$runA u1 u2 u3 $runB"
    val d22 = s"v1 v2 $runA w1 w2 w3 w4 $runB"
    val sp = Dedup.sharedNgramSpans(
      Seq(Doc(21L, d21, "en"), Doc(22L, d22, "en"),
          Doc(23L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", "en")).toDF(),
      col("doc_id"), col("text"), n = 5)
      .select("doc", "span_start", "span_end", "n_tokens")
      .as[(Long, Int, Int, Int)].collect().toSet
    // d21: runA starts at 0 (span 0..0, 5 toks); runB at token 8 ->
    // starts 8..11 (4 starts, 8 toks). d22: runA at 2 (span 2..2);
    // runB at token 11 -> starts 11..14.
    assert(sp == Set(
      (21L, 0, 0, 5), (21L, 8, 11, 8),
      (22L, 2, 2, 5), (22L, 11, 14, 8)), s"got $sp")
  }

  test("coveredTokenMass: overlapping windows union-merge, never double-count") {
    // docA's shared 5-gram starts are {0, 2} (start 1 is NOT in docB):
    // their token windows 0..4 and 2..6 OVERLAP — the union is the
    // whole 7-token doc, while a naive per-span length sum says 10.
    // docB's shared starts {0, 6} gap by more than n → two disjoint
    // intervals, token 5 ('X') stays uncovered.
    val a = "a1 a2 a3 a4 a5 a6 a7"
    val b = "a1 a2 a3 a4 a5 X a3 a4 a5 a6 a7"
    val got = Dedup.coveredTokenMass(
      Seq(Doc(31L, a, "en"), Doc(32L, b, "en")).toDF(),
      col("doc_id"), col("text"), n = 5)
      .select("doc", "covered_tokens", "n_spans")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(31L -> ((7L, 1L)), 32L -> ((10L, 2L))),
           s"got $got")
  }

  test("simhashHammingPairs: exact dups at distance 0; recall vs brute force") {
    val pairs = Dedup.simhashHammingPairs(
      docs, col("doc_id"), col("text"), maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 0)
    // banding must find EVERY pair within the Hamming radius (pigeonhole)
    val sigs = Dedup.simhashSig32(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val brute = for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b)
    assert(m.keySet == brute.toSet)
  }

  test("simhashHammingPairs64: brute-force equivalence, bands mask right") {
    // the corpus-scale 64-bit variant must find EXACTLY the pairs a
    // brute-force 64-bit Hamming scan finds (pigeonhole recall at
    // <= 3), including signatures with bit 63 set (band 3's arithmetic
    // shift sign-extends — the mask must still slice bits 48..63)
    val pairs = Dedup.simhashHammingPairs64(
      docs, col("doc_id"), col("text"), maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 0) // exact dups agree on all 64 bits
    val sigs = Dedup.simhashSig64(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(m == brute, s"64-bit banding missed/invented pairs: " +
      s"got ${m.keySet}, brute ${brute.keySet}")
    // negative signatures (bit 63 set) really occur in this corpus —
    // otherwise the sign-extension path went untested
    assert(sigs.values.exists(_ < 0L),
      "fixture produced no negative sig64; strengthen the corpus")
  }

  test("simhash: token-less docs have no signature (mirror the oracle)") {
    // an empty/whitespace doc would otherwise get a fabricated all-zero
    // signature while the oracle's unnest drops it before the CTE
    val withEmpty = docs.union(
      Seq(Doc(99L, "", "en"), Doc(98L, "   ", "en")).toDF())
    val sigs = Dedup.simhashSignature(
      withEmpty, col("doc_id"), col("text"), bits = 32)
      .select("doc_id").as[Long].collect().toSet
    assert(!sigs.contains(99L) && !sigs.contains(98L), sigs.toString)
    assert(sigs == Set(1L, 2L, 3L, 4L, 5L))
    val sig32 = Dedup.simhashSig32(withEmpty, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(sig32 == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("connectedComponents works on an arbitrary edge list") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("x", "y")
    val comp = Dedup.connectedComponents(edges, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents: pointer-halving shortcut and reliable checkpointing") {
    // a 64-node chain — the worst case for plain min-propagation
    // (O(diameter) rounds); the shortcut variant must still converge to
    // the identical labels
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("x", "y")
    val viaShortcut = Dedup
      .connectedComponents(edges, "x", "y", shortcut = true)
      .as[(Long, Long)].collect()
    assert(viaShortcut.length == 64 && viaShortcut.forall(_._2 == 0L))
    // reliable mode fails fast without a checkpoint dir…
    assertThrows[IllegalArgumentException](
      Dedup.connectedComponents(edges, "x", "y", reliable = true))
    // …and produces the same components with one (survives executor
    // loss at 100 TB, unlike localCheckpoint's executor-local blocks)
    val ckBase = tmpDir("cc-ckpt")
    spark.sparkContext.setCheckpointDir(ckBase)
    val rel = Dedup.connectedComponents(edges, "x", "y", reliable = true)
      .as[(Long, Long)].collect()
    assert(rel.toMap == viaShortcut.toMap)
    // rolling deletion: after a 64-round chain fixpoint, storage holds
    // exactly ONE label table (the result) and the edge table is gone —
    // not one copy per iteration
    def walk(f: java.io.File): Seq[java.io.File] =
      Seq(f) ++ Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    val dirs = walk(new java.io.File(ckBase)).filter(_.isDirectory)
    assert(dirs.count(_.getName.startsWith("iter-")) == 1,
      s"superseded checkpoints not deleted: ${dirs.map(_.getName)}")
    assert(!dirs.exists(_.getName == "edges"),
      s"edge checkpoint not reclaimed: ${dirs.map(_.getName)}")
  }

  test("connectedComponents folds convergence into the update job (no count() jobs)") {
    // r1/r2 ran a separate count() action per iteration to detect the
    // fixpoint — at 100 TB that doubles the job count of the loop. The
    // accumulator fold must leave ZERO count()-originated jobs.
    @volatile var totalJobs = 0
    @volatile var countJobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        totalJobs += 1
        val cs = Option(js.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse("")
        if (cs.startsWith("count at")) countJobs += 1
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val edges = (0L until 8L).map(i => (i, i + 1)).toDF("x", "y")
      val comp = Dedup.connectedComponents(edges, "x", "y")
        .as[(Long, Long)].collect()
      assert(comp.forall(_._2 == 0L))
      // listener delivery is async — drain the WHOLE event bus before
      // asserting (first-event detection raced late-delivered events:
      // a count() job's event arriving after the assert would pass
      // vacuously — review r4 test pass)
      org.apache.spark.GraftTestBus.waitUntilEmpty(
        spark.sparkContext, 10000)
      assert(totalJobs > 0, "listener saw no jobs")
      assert(countJobs == 0,
        s"convergence still runs count() actions ($countJobs of $totalJobs jobs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("minhash/jaccard hot-shingle cap kills boilerplate, keeps true dups") {
    val boiler = "this license header is attached to every single document here"
    val corpus = ((1 to 20).map(i =>
        Doc(i.toLong, s"$boiler unique$i tail$i words$i", "en")) ++ Seq(
        Doc(21L, "totally shared duplicate tail one two three four five", "en"),
        Doc(22L, "totally shared duplicate tail one two three four five", "en")))
      .toDF()
    // uncapped: the shared header makes all 20 boilerplate docs pairwise
    // "similar" (J ≈ 0.57) — C(20,2) = 190 junk pairs
    val uncapped = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.05)
    assert(uncapped.count() > 100)
    // capped at df ≤ 5: boilerplate shingles (df = 20) leave the index;
    // only the true duplicate pair survives, at full J = 1.0
    val capped = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.05, maxShingleDocFreq = Some(5))
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect()
    assert(capped.map(p => (p._1, p._2)).toSeq == Seq((21L, 22L)))
    assert(capped.head._3 == 1.0)
    // same story through the minhash signatures
    val mh = Dedup.minhashPairs(corpus, col("doc_id"), col("text"),
        shingle = 3, minMatch = 8, maxShingleDocFreq = Some(5))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh == Set((21L, 22L)))
    // the FRACTION cap (the corpus-size-independent form): df > 22·0.23
    // ≈ df > 5 — identical result to the absolute cap on this corpus
    val fracJac = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.05, maxShingleDocFrac = Some(0.23))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(fracJac == Seq((21L, 22L)))
    val fracMh = Dedup.minhashPairs(corpus, col("doc_id"), col("text"),
        shingle = 3, minMatch = 8, maxShingleDocFrac = Some(0.23))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fracMh == Set((21L, 22L)))
    // both caps set: the higher bar wins (frac 0.23 ≈ 5 > absolute 1,
    // so the true-dup shingles at df = 2 still survive)
    val both = Dedup.minhashPairs(corpus, col("doc_id"), col("text"),
        shingle = 3, minMatch = 8, maxShingleDocFreq = Some(1),
        maxShingleDocFrac = Some(0.23))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(both == Set((21L, 22L)))
  }

  test("embeddingNearDupPairs returns exactly the planted pairs") {
    val vs = Seq(
      Vec(1L, Array(1f, 0.2f, 0.1f, 0.05f)),
      Vec(2L, Array(0.99f, 0.21f, 0.1f, 0.05f)),   // near-dup of 1 (cos ≈ 1)
      Vec(3L, Array(0.1f, 0.9f, 0.2f, 0.1f)),      // same bucket as 1/2, cos ≈ 0.32
      Vec(5L, Array(-1f, -0.2f, -0.1f, -0.05f)),
      Vec(6L, Array(-0.99f, -0.21f, -0.1f, -0.05f)), // near-dup of 5, negative bucket
      Vec(7L, Array(-0.1f, 0.9f, -0.2f, 0.3f))     // alone in its bucket
    ).toDF()
    val pairs = Sim.embeddingNearDupPairs(
        vs, col("vec_id"), col("embedding"), bits = 4, minCos = 0.9)
      .select("a_id", "b_id", "cos").as[(Long, Long, Double)]
      .collect().sortBy(p => (p._1, p._2))
    // exactly the planted near-dups — bucket pruning dropped neither
    // (both share their partner's sign pattern at bits = 4), and the
    // same-bucket low-cosine pair (1,3)/(2,3) was confirmed away
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (5L, 6L)))
    assert(pairs.forall(_._3 >= 0.99))
  }

  test("knnGraph: mutuality keeps the tight pair, drops one-directional edges") {
    val vs = Seq(
      Vec(1L, Array(1f, 0f)),
      Vec(2L, Array(0.99f, 0.1f)),   // mutual nearest with 1 (cos ≈ .995)
      Vec(3L, Array(0.5f, 0.8f)),    // its top-1 is 2, but 2's top-1 is 1
      Vec(4L, Array(-1f, 0f))        // top-1 is 3; 3 doesn't reciprocate
    ).toDF()
    val k1 = Sim.knnGraph(vs, col("vec_id"), col("embedding"), k = 1)
      .select("node_a", "node_b").as[(Long, Long)].collect().toSeq
    assert(k1 == Seq((1L, 2L)), s"k=1 mutual edges: $k1")
    // k = n−1: every neighbour list holds everyone → complete graph
    val k3 = Sim.knnGraph(vs, col("vec_id"), col("embedding"), k = 3)
      .select("node_a", "node_b").as[(Long, Long)].collect().toSet
    assert(k3.size == 6, s"k=3 should yield all C(4,2) edges: $k3")
  }

  test("knnGraphLsh: matches the exact graph when neighbours share buckets; bits auto-size") {
    // dim ≥ 8 so the 8-bit floor has real sign patterns; two tight
    // clusters on opposite sides of the first hyperplane → each
    // vector's true neighbours share its bucket, so the SRP-blocked
    // graph must equal the exact one edge-for-edge (recall loss can
    // only come from cross-bucket neighbours, absent by construction)
    def v(base: Array[Float], eps: Float) =
      base.zipWithIndex.map { case (x, i) => if (i == 7) x + eps else x }
    val a = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 0.5f)
    val b = Array(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -0.5f)
    val vs = Seq(
      Vec(1L, v(a, 0f)), Vec(2L, v(a, 0.02f)), Vec(3L, v(a, 0.04f)),
      Vec(4L, v(b, 0f)), Vec(5L, v(b, -0.02f)), Vec(6L, v(b, -0.04f))
    ).toDF()
    val exact = Sim.knnGraph(vs, col("vec_id"), col("embedding"), k = 2)
      .select("node_a", "node_b", "cos").as[(Long, Long, Double)]
      .collect().toSet
    val blocked = Sim.knnGraphLsh(vs, col("vec_id"), col("embedding"),
        k = 2).select("node_a", "node_b", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == exact, s"blocked $blocked vs exact $exact")
    assert(exact.map(e => (e._1, e._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)))
    // auto-sizing: n = 20k, target 64 → (19999 div 64) = 312 =
    // 0b100111000 → 9 bits (and never past the embedding dim)
    val big = spark.range(20000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((hash(col("id") * 16 + i) % 1000) / lit(1000.0))
          .cast("float")).as("embedding"))
    val bl = Sim.knnGraphLsh(big, col("vec_id"), col("embedding"), k = 1)
    // pin the derived width via the plan's bucket expression input:
    // re-derive the formula the implementation must agree with
    val bits = math.max(8, java.lang.Long.toBinaryString(19999L / 64).length)
    assert(bits == 9)
    bl.count() // and the 20k-vector graph builds without an n² join
  }

  test("lshTopK multi-probe: candidates grow monotonically, within the exact set") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    def run(p: Int) = Sim.lshTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0, bits = 6, k = 10000, nprobe = p)
      .select("cand_id").as[Long].collect().toSet
    val p1 = run(1)
    val p4 = run(4)
    val p7 = run(7)        // bits + 1 = all Hamming-1 neighbours
    assert(p1.subsetOf(p4) && p4.subsetOf(p7),
      "probing more buckets must only add candidates")
    assert(p4.size > p1.size,
      "Hamming-1 buckets of this fixture are non-empty — nprobe must widen the scan")
    val exact = Sim.cosineTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0, k = 10000)
      .select("cand_id").as[Long].collect().toSet
    assert(p7.subsetOf(exact))
    assertThrows[IllegalArgumentException](run(8))   // > bits + 1
  }

  test("Sim: lshTopK candidates are a subset of cosineTopK's collection scan") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val exact = Sim.cosineTopK(emb, col("vec_id"), col("embedding"),
      isQuery = col("vec_id") === 0, k = 5)
    val approx = Sim.lshTopK(emb, col("vec_id"), col("embedding"),
      isQuery = col("vec_id") === 0, bits = 4, k = 5)
    val exactTop = exact.select("cand_id").as[Long].collect().toSet
    val approxTop = approx.select("cand_id").as[Long].collect().toSet
    assert(exactTop.size == 5 && approxTop.nonEmpty)
    // same scoring: any shared candidate has the identical rounded cosine
    val ec = exact.select("cand_id", "cos").as[(Long, Double)]
      .collect().toMap
    val ac = approx.select("cand_id", "cos").as[(Long, Double)]
      .collect().toMap
    (exactTop & approxTop).foreach(id => assert(ec(id) == ac(id)))
  }

  test("hash16Fast keeps uniformity and determinism with the fast hasher") {
    val df = Seq.tabulate(2000)(i => (i.toLong, "a")).toDF("id", "s")
    val kept = Pipeline.sampleStratified(
      df, col("s"), col("id"), Map("a" -> 0.5), default = 1.0,
      hasher = Pipeline.hash16Fast)
    val n = kept.count()
    assert(n > 800 && n < 1200, s"got $n")   // ~50%, hash-uniform
    val again = Pipeline.sampleStratified(
      df, col("s"), col("id"), Map("a" -> 0.5), default = 1.0,
      hasher = Pipeline.hash16Fast)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }

  test("ivfTopK nprobe>1 probes more cells and only improves recall") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    def run(p: Int) = Sim.ivfTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 3,
        isCentroid = col("vec_id") % 100 === 0, k = 3, nprobe = p)
      .select("cand_id", "cos").as[(Long, Double)].collect().toMap
    val p1 = run(1)
    val p3 = run(3)
    val exact = Sim.cosineTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 3, k = 3)
      .select("cand_id", "cos").as[(Long, Double)].collect().toMap
    assert(p1.size == 3 && p3.size == 3)
    // nprobe=3's worst kept cosine is >= nprobe=1's (more candidates
    // can only improve the top-k), and <= the exact scan's
    assert(p3.values.min >= p1.values.min)
    assert(exact.values.min >= p3.values.min)
  }

  test("Sim predicates may reference any original column, not post-rename names") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    // label is neither the id nor the embedding — it would be dropped by
    // the internal projection; the flags are evaluated before it
    val byLabel = Sim.cosineTopK(emb, col("vec_id"), col("embedding"),
      isQuery = col("label") === 5 && col("vec_id") < 50, k = 2)
    assert(byLabel.select("q_id").distinct().count() > 0)
    val ivf = Sim.ivfTopK(emb, col("vec_id"), col("embedding"),
      isQuery = col("label") === 5 && col("vec_id") < 50,
      isCentroid = col("label") === 0, k = 2)
    assert(ivf.select("q_id").distinct().count() > 0)
  }

  test("quantizeInt8: exact planted values, drop rules, dequant bound") {
    val df = Seq(
      Vec(1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      Vec(2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // all-zero: no scale
      Vec(3L, null)                              // null: dropped
    ).toDF()
    val q = Sim.quantizeInt8(df, col("vec_id"), col("embedding"))
      .as[(Long, Array[Int], Double)].collect()
    assert(q.map(_._1).toSeq == Seq(1L))         // 2 and 3 dropped
    val (_, qv, scale) = q.head
    assert(scale == 127.0)                       // amax = 1.0
    assert(qv.toSeq == Seq(64, -127, 32, 0))     // round(0.5·127)=64 (HALF_UP)
    // dequantization error ≤ 0.5/scale per element
    val orig = Seq(0.5f, -1.0f, 0.25f, 0.0f)
    qv.zip(orig).foreach { case (qi, x) =>
      assert(math.abs(qi / scale - x) <= 0.5 / scale + 1e-12) }
  }

  test("pqTopK: planted codebook copies rank by true distance, ADC 0 for encodable dups") {
    // 4-dim vectors, m=2 → 2-dim subvectors. Codebook rows 0..3 are 4
    // distinct patterns; 10 is pattern0 + tiny per-dim noise (encodes
    // to pattern0's codes in both subspaces), 11 is an exact copy of
    // pattern1. Query 20 IS pattern0: its LUT distance to code 0 is 0
    // in both subspaces, so every candidate encoded as (0,0) scores
    // ADC 0 — the dup tier — while pattern1/2/3 copies score the true
    // inter-pattern distance on the 1e-4 grid.
    val p0 = Array(1f, 0f, 0f, 0f)
    val p1 = Array(0f, 1f, 0f, 0.5f)
    val p2 = Array(0f, 0f, 1f, -0.5f)
    val p3 = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val df = Seq(
      Vec(0L, p0), Vec(1L, p1), Vec(2L, p2), Vec(3L, p3),
      Vec(10L, Array(1.001f, 0.001f, -0.001f, 0.001f)),
      Vec(11L, p1.clone()),
      Vec(20L, p0.clone())
    ).toDF()
    val got = Sim.pqTopK(df, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 20L, isCodebook = col("vec_id") < 4L,
        m = 2, k = 6)
      .orderBy(col("rn"))
      .as[(Long, Long, Long, Int)].collect()
    // ADC-0 tier first (codebook row 0 and near-copy 10, id order);
    // then p3 (1e8 = 2·5e7); then a THREE-way tie at 2.25e8 — p1, its
    // copy 11, and p2 (1e8 + 1.25e8) — resolved by cand_id
    assert(got.map(_._2).toSeq == Seq(0L, 10L, 3L, 1L, 2L, 11L),
           s"${got.toSeq}")
    assert(got.take(2).forall(_._3 == 0L), s"${got.toSeq}")
    // ADC of an exact pattern copy equals the exact grid distance:
    // p0 vs p1 = 10000² + 10000² + 0 + 5000² = 2.25e8
    assert(got.find(_._2 == 11L).get._3 == 225000000L, s"${got.toSeq}")
    // partitioning invariance: 1 vs 5 partitions, identical rows
    val wide = Sim.pqTopK(df.repartition(5), col("vec_id"),
        col("embedding"), isQuery = col("vec_id") === 20L,
        isCodebook = col("vec_id") < 4L, m = 2, k = 6)
      .orderBy(col("rn")).as[(Long, Long, Long, Int)].collect()
    assert(wide.toSeq == got.toSeq)

    // IVF-PQ composition on the same frame (patterns double as cell
    // centroids): probing ALL cells must reproduce plain PQ exactly…
    val full = Sim.ivfPqTopK(df, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 20L, isCentroid = col("vec_id") < 4L,
        isCodebook = col("vec_id") < 4L, m = 2, nprobe = 4, k = 6)
      .orderBy(col("rn")).as[(Long, Long, Long, Int)].collect()
    assert(full.toSeq == got.toSeq, s"${full.toSeq} vs ${got.toSeq}")
    // …while nprobe=1 prunes to the query's own cell: query 20 IS
    // pattern0, so only centroid 0 and near-copy 10 survive the
    // inverted-file tier (the other patterns live in their own cells)
    val one = Sim.ivfPqTopK(df, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 20L, isCentroid = col("vec_id") < 4L,
        isCodebook = col("vec_id") < 4L, m = 2, nprobe = 1, k = 6)
      .orderBy(col("rn")).as[(Long, Long, Long, Int)].collect()
    assert(one.map(_._2).toSeq == Seq(0L, 10L) &&
           one.forall(_._3 == 0L), s"${one.toSeq}")
  }

  /** 3 planted clusters around near-orthogonal directions; ids 0,1,2
    * land one per cluster so the lowest-id init seeds each basin.
    * Shared by both kmeans tests — two verbatim copies could drift
    * (review r4 test pass). */
  private def plantedVecs: Seq[Vec] = {
    def jitter(base: Array[Float], s: Float): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + s * (i % 3 - 1) * 0.05f }
    val bases = Seq(
      Array(1f, 0f, 0f, 0.1f), Array(0f, 1f, 0f, -0.1f),
      Array(0f, 0f, 1f, 0.2f))
    (0 until 30).map { i =>
      Vec(i.toLong, jitter(bases(i % 3), (i / 3).toFloat))
    }
  }

  test("kmeansFit recovers planted clusters; assign is deterministic") {
    val df = plantedVecs.toDF()
    val model = Sim.kmeansFit(df, col("vec_id"), col("embedding"),
                              k = 3, iters = 4)
    val m = model.orderBy("cell")
      .as[(Int, Array[Float], Long)].collect()
    assert(m.map(_._1).toSeq == Seq(0, 1, 2))
    assert(m.map(_._3).sum == 30L && m.forall(_._3 == 10L))
    val centroids = model.select("cell", "centroid")
    val a = Sim.kmeansAssign(df, col("vec_id"), col("embedding"), centroids)
      .as[(Long, Int, Double)].collect().toSeq
    // all members of a plant share a cell; different plants differ
    val byPlant = a.groupBy(_._1 % 3).map { case (p, xs) =>
      p -> xs.map(_._2).distinct }
    assert(byPlant.values.forall(_.size == 1), s"mixed cells: $byPlant")
    assert(byPlant.values.flatten.toSet.size == 3)
    // deterministic: a second fit+assign produces the identical result
    val again = Sim.kmeansAssign(df, col("vec_id"), col("embedding"),
      Sim.kmeansFit(df, col("vec_id"), col("embedding"), k = 3, iters = 4)
        .select("cell", "centroid"))
      .as[(Long, Int, Double)].collect().toSeq
    assert(a.sortBy(_._1) == again.sortBy(_._1))
    // k > natural clusters: empty cells keep their init centroid, 0 members
    val wide = Sim.kmeansFit(df, col("vec_id"), col("embedding"),
                             k = 5, iters = 3)
    assert(wide.count() == 5)
    assert(wide.agg(sum("n_members")).as[Long].collect().head == 30L)
  }

  test("kmeansFit is partition-count invariant (1/7/13)") {
    // the same discipline the sketch aggregates pass: physical layout
    // must never leak into the model. Fit + assign on 1, 7, and 13
    // input partitions must produce byte-identical centroid tables and
    // assignments (init is an orderBy-limit, updates are hash-aggs —
    // both layout-free; this pins it).
    val base = plantedVecs.toDF()
    val runs = Seq(1, 7, 13).map { p =>
      val df = base.repartition(p)
      val model = Sim.kmeansFit(df, col("vec_id"), col("embedding"),
                                k = 3, iters = 4)
      val cents = model.orderBy("cell")
        .as[(Int, Array[Float], Long)].collect()
        .map { case (c, e, n) => (c, e.toSeq, n) }.toSeq
      val assign = Sim.kmeansAssign(df, col("vec_id"), col("embedding"),
          model.select("cell", "centroid"))
        .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
      (cents, assign)
    }
    assert(runs(0) == runs(1), "1 vs 7 partitions diverged")
    assert(runs(0) == runs(2), "1 vs 13 partitions diverged")
  }

  test("bpeTrain is partition-count invariant (1/7/13)") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread the corpus over many rows so repartition actually moves
    // data (the single-row doc of the classic test can't)
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val runs = Seq(1, 7, 13).map(p =>
      graft.api.Text.bpeTrain(docs.repartition(p), col("text"),
        merges = 4))
    assert(runs(0) == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)), runs(0).toString)
    assert(runs(0) == runs(1) && runs(0) == runs(2),
      s"merge tables diverged across partitionings: $runs")
  }

  test("kmeansFit centroids drive ivfTopK (the advertised wiring)") {
    val df = plantedVecs.toDF()
    val cents = Sim.kmeansFit(df, col("vec_id"), col("embedding"),
        k = 3, iters = 4)
      .select(col("cell"), col("centroid")).as[(Int, Array[Float])]
      .collect()
    // trained centroids join the frame as synthetic rows; ivfTopK routes
    // by nearest centroid, so query 0's candidates must all come from
    // plant 0's cell — members (id ≡ 0 mod 3) or that cell's centroid
    val withCents = df.unionByName(
      cents.map { case (c, v) => Vec(1000L + c, v) }.toSeq.toDF())
    val ivf = Sim.ivfTopK(withCents, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0L,
        isCentroid = col("vec_id") >= 1000L, k = 3)
      .select("q_id", "cand_id").as[(Long, Long)].collect()
    assert(ivf.length == 3)
    // plant 0's cell is cell 0 (init centroid i IS vec i ∈ plant i and
    // Lloyd's converges within basins) — so the only legal non-member
    // candidate is centroid 1000, not any centroid
    assert(ivf.forall { case (_, c) => c == 1000L || c % 3 == 0 },
      s"cross-cluster leak: ${ivf.toSeq}")
    assert(ivf.exists { case (_, c) => c < 1000L && c % 3 == 0 },
      s"no true member returned: ${ivf.toSeq}")
  }

  test("mixRates: budget math, 1.0 cap, and rates feed sampleStratified") {
    val corpus = Seq.tabulate(300) { i =>
      val lang = if (i % 3 == 0) "en" else "de"   // en: 100 docs, de: 200
      (i.toLong, lang, 10L)                        // 10 tokens each
    }.toDF("id", "lang", "n_tok")
    val rates = graft.api.Pipeline.mixRates(
        corpus, col("lang"), col("n_tok"),
        weights = Map("en" -> 0.5, "de" -> 0.25), budget = 4000L)
      .orderBy("stratum")
      .as[(String, Long, Double, Long)].collect().toSeq
    // en: 1000 toks < 0.5·4000 → capped at 1.0; de: 1000/2000 = 0.5
    assert(rates == Seq(("de", 2000L, 0.5, 1000L),
                        ("en", 1000L, 1.0, 1000L)), s"got $rates")
    // the planning output drives the sampler: realized kept tokens land
    // near the plan (hash-uniform, 2000 docs of 10 → ±few %)
    val rateMap = rates.map(r => r._1 -> r._3).toMap
    val kept = graft.api.Pipeline.sampleStratified(
        corpus, col("lang"), col("id"), rateMap, default = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") == 100L)                     // rate 1.0 keeps all
    assert(kept("de") > 70L && kept("de") < 130L, s"got ${kept("de")}")
  }

  test("editDistPairs: blocking bounds candidates, distance confirms") {
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brwon fox"),    // transposition, dist 2, same block
      (3L, "the quick brown fix"),    // substitution, dist 1, same block
      (4L, "the slow brown fox"),     // same block, dist 4 — filtered
      (5L, "a quick brown fox")       // different block — never compared
    ).toDF("id", "t")
    val blk = split(col("t"), " ").getItem(0)
    val pairs = graft.api.Dedup.editDistPairs(
        rows, col("id"), col("t"), blk, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // (1,2) d=2, (1,3) d=1, (2,3) d=3 filtered, 4 too far, 5 unblocked
    assert(pairs == Set((1L, 2L, 2), (1L, 3L, 1)), s"got $pairs")
    // recall contract: 5 is dist 4 from 1 but in another block — absent
    // even with a huge maxDist
    val wide = graft.api.Dedup.editDistPairs(
        rows, col("id"), col("t"), blk, maxDist = 100)
      .filter(col("a_id") === 5L || col("b_id") === 5L)
    assert(wide.count() == 0)
  }

  test("keepLatest: one row per key, version tiebreak total, full payload") {
    val df = Seq(
      (1L, 10L, "2024-01-01", "old"),
      (1L, 11L, "2024-01-02", "mid"),
      (1L, 12L, "2024-01-02", "new"),   // same date as 11 — id breaks the tie
      (2L, 20L, "2023-12-31", "only")
    ).toDF("k", "id", "d", "payload")
    val latest = Dedup.keepLatest(
      df, keys = Seq(col("k")), version = Seq(col("d"), col("id")))
    assert(latest.columns.toSeq == df.columns.toSeq)
    val rows = latest.orderBy("k").as[(Long, Long, String, String)]
      .collect().toSeq
    assert(rows == Seq((1L, 12L, "2024-01-02", "new"),
                       (2L, 20L, "2023-12-31", "only")))
  }

  test("intervalOverlapJoin: closed bounds, exactly-once pairs, key blocking") {
    import graft.api.Events
    val a = Seq(
      (1L, 10L, 0L, 100L),     // spans 7 buckets at W=16
      (1L, 11L, 100L, 110L),   // touches 10's end exactly (closed)
      (1L, 12L, 111L, 120L),   // adjacent, no overlap with 11
      (2L, 20L, 0L, 100L)      // other key: never compared to key 1
    ).toDF("a_k", "a_id", "a_s", "a_e")
    val b = a.toDF("b_k", "b_id", "b_s", "b_e")
    val pairs = Events.intervalOverlapJoin(
        a, b, col("a_k"), col("b_k"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"), bandWidth = 16L)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    // (10,11) share exactly the point 100 (closed semantics); (11,12)
    // are adjacent-but-disjoint; cross-key pairs never appear; and the
    // 7-bucket overlap of (10,11) emits ONE row, not one per bucket
    assert(pairs == Seq((10L, 11L)), s"$pairs")
    // self-pairs exist once per interval (i overlaps itself)
    val self = Events.intervalOverlapJoin(
        a, b, col("a_k"), col("b_k"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"), bandWidth = 16L)
      .filter(col("a_id") === col("b_id"))
    assert(self.count() == 4)
    // W larger than every interval still finds the pair exactly once
    val wide = Events.intervalOverlapJoin(
        a, b, col("a_k"), col("b_k"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"), bandWidth = 1000L)
      .filter(col("a_id") < col("b_id")).count()
    assert(wide == 1)
  }

  test("pageRank: exact fixed-point match vs a reference loop, any partitioning") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 3L))
    // reference: the same integer recurrence in plain Scala
    val unit = 1000000000000L
    val base = unit * 15 / 100
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var ref = nodes.map(_ -> unit).toMap
    for (_ <- 1 to 3) {
      val c = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / odeg(s) }.sum).toMap
      ref = nodes.map { n =>
        val cc = c.getOrElse(n, 0L)
        n -> (base + (cc / 100) * 85 + (cc % 100) * 85 / 100)
      }.toMap
    }
    for (parts <- Seq(1, 7)) {
      val got = graft.api.Graph.pageRank(
        spark, edges.toDF("src", "dst").repartition(parts), iterations = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == ref, s"parts=$parts got=$got ref=$ref")
    }
    // the no-in-edge node holds exactly the base mass
    assert(ref(4L) == base)
  }

  test("psi: zero on identical snapshots, grows with shift, one-sided buckets finite") {
    import graft.api.Etl
    val ref = (Seq.fill(50)(1) ++ Seq.fill(30)(2) ++ Seq.fill(20)(3))
      .toDF("b")
    // identical distributions → every term 0, psi 0
    val same = Etl.psi(ref, ref, col("b")).collect()
    assert(same.forall(r => r.getAs[Double]("psi_term") == 0.0 &&
                            r.getAs[Double]("psi") == 0.0))
    // mild shift vs near-total shift: psi must order them
    val mild = (Seq.fill(40)(1) ++ Seq.fill(40)(2) ++ Seq.fill(20)(3)).toDF("b")
    val wild = (Seq.fill(5)(1) ++ Seq.fill(5)(2) ++ Seq.fill(90)(3)).toDF("b")
    def psiOf(cur: org.apache.spark.sql.DataFrame): Double =
      Etl.psi(ref, cur, col("b")).select("psi").as[Double].head()
    assert(psiOf(mild) > 0.0 && psiOf(wild) > psiOf(mild) * 5,
      s"mild=${psiOf(mild)} wild=${psiOf(wild)}")
    // a bucket present only in `cur` yields a finite term (smoothing),
    // and categorical (string) buckets work as-is
    val catRef = Seq("a", "a", "b").toDF("b")
    val catCur = Seq("a", "b", "c").toDF("b")
    val rows = Etl.psi(catRef, catCur, col("b")).collect()
    assert(rows.length == 3 &&
      rows.forall(r => !r.getAs[Double]("psi_term").isNaN &&
                       !r.getAs[Double]("psi_term").isInfinite))
    // n_ref/n_cur are the raw counts (smoothing touches probabilities
    // only, never the reported counts)
    val c = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(c == Set(("a", 2L, 1L), ("b", 1L, 1L), ("c", 0L, 1L)), c.toString)
  }

  test("snapshotDiff: four classes, null payload distinct from 'null'") {
    import graft.api.Etl
    val old_ = Seq(
      (1L, Option("x"), 10L),   // unchanged
      (2L, Option("y"), 20L),   // changed (value)
      (3L, None: Option[String], 30L),  // changed: null -> "null" string
      (4L, Option("z"), 40L)    // removed
    ).toDF("k", "p", "v")
    val new_ = Seq(
      (1L, Option("x"), 10L),
      (2L, Option("y"), 21L),
      (3L, Option("null"), 30L), // the literal string "null"
      (5L, Option("w"), 50L)     // added
    ).toDF("k", "p", "v")
    val got = Etl.snapshotDiff(old_, new_, keys = Seq("k"),
        payload = Seq("p", "v"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
                      3L -> "changed", 4L -> "removed", 5L -> "added"),
           s"$got")
  }

  test("snapshotDiff: NULL keys never match (join semantics, not groupBy)") {
    import graft.api.Etl
    // both snapshots hold a null-keyed row with the SAME payload: a
    // plain groupBy would null-safely pair them into 'unchanged'; the
    // FULL OUTER JOIN the docstring promises classifies removed+added
    val old_ = Seq((Option(1L), "x"), (None: Option[Long], "same"))
      .toDF("k", "p")
    val new_ = Seq((Option(1L), "x"), (None: Option[Long], "same"))
      .toDF("k", "p")
    val got = Etl.snapshotDiff(old_, new_, keys = Seq("k"),
        payload = Seq("p"))
      .select("k", "change").as[(Option[Long], String)].collect()
    assert(got.count(_ == (Some(1L), "unchanged")) == 1)
    assert(got.count(_ == (None, "removed")) == 1, got.toSeq.toString)
    assert(got.count(_ == (None, "added")) == 1, got.toSeq.toString)
    assert(got.length == 3, got.toSeq.toString)
    // a key named like the output column is refused loudly
    assertThrows[IllegalArgumentException](
      Etl.snapshotDiff(old_.withColumnRenamed("k", "change"),
        new_.withColumnRenamed("k", "change"),
        keys = Seq("change"), payload = Seq("p")))
  }

  test("cosineTopK excludes zero-norm vectors instead of faking cos") {
    // vec 3 is all-zero: its cosine is undefined (NaN). The window form
    // ranked it FIRST (NaN sorts above all doubles); the long encoding
    // would fake cos 0.0. It must simply never appear.
    val vs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.1f)),
      (3L, Array(0f, 0f)), (4L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = graft.api.Sim.cosineTopK(
        vs, col("vec_id"), col("embedding"), col("vec_id") === 1, k = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.map(_._2).toSet == Set(2L, 4L), got.toSeq.toString)
    assert(got.forall(r => !r._3.isNaN))
  }

  test("applyChanges: NULL tombstone flag is an upsert, never a delete") {
    // ADVICE r3: with an unguarded isDelete, a NULL flag on the winning
    // change row rode filter(!del) into silently DROPPING the key
    val base = Seq((1L, 1L, "b1"), (2L, 1L, "b2"), (3L, 1L, "b3"))
      .toDF("k", "v", "p")
    val changes = Seq(
      (1L, 2L, "up"),      // flag NULL -> upsert wins
      (2L, 2L, "DEL"),     // real tombstone -> key leaves
      (3L, 0L, "stale"))   // older than base -> base survives
      .toDF("k", "v", "p")
    val got = Dedup.applyChanges(
        base, changes, keys = Seq(col("k")), version = Seq(col("v")),
        isDelete = when(col("p") === "DEL", lit(true)) // NULL otherwise
      ).orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "up"), (3L, 1L, "b3")), s"$got")
  }

  test("redact: pattern order matters, global replacement, custom sets") {
    val df = Seq(
      "mail bob.smith+x@foo-bar.co.uk and carol@ex.io now",
      "server 192.168.001.255 acct 1234567 ok",
      "short 12345 stays; 123456 goes"
    ).toDF("t")
    val out = graft.api.Text.redact(df, col("t")).as[(String, String)]
      .collect().map(_._2).toSeq
    assert(out(0) == "mail <EMAIL> and <EMAIL> now")       // both, globally
    assert(out(1) == "server <IP> acct <ID> ok")           // IP before ID
    assert(out(2) == "short 12345 stays; <ID> goes")       // 6+ digits only
    // custom pattern set applies in the caller's order
    val custom = graft.api.Text.redact(
      df, col("t"), Seq("[0-9]+" -> "#"), out = "r")
    assert(custom.select("r").as[String].collect()(1) ==
      "server #.#.#.# acct # ok")
  }

  test("normalizeUrl: host case, tracking strip, separator repair") {
    val cases = Seq(
      // tracking first: its '?' is consumed, next param promoted
      "HTTP://Ex.COM/p?utm_source=a&id=1"  -> "http://ex.com/p?id=1",
      // tracking mid + end
      "http://ex.com/p?id=1&ref=x&page=2&utm_c=z" ->
        "http://ex.com/p?id=1&page=2",
      // only tracking params: query vanishes entirely
      "https://A.B/p?utm_a=1&ref=2"        -> "https://a.b/p",
      // nothing to do (path case preserved — only host lowercases)
      "https://ex.com/Path?id=9"           -> "https://ex.com/Path?id=9",
      // no query at all
      "FTP://HOST.X/file"                  -> "ftp://host.x/file",
      // 'href=' must NOT lose its 'ref=' tail (separator anchors it)
      "http://ex.com/p?href=ok&utm_x=1"    -> "http://ex.com/p?href=ok",
      // '&' in the PATH is RFC-legal and must survive untouched
      "https://ex.com/wiki/AT&T"           -> "https://ex.com/wiki/AT&T",
      "https://ex.com/a&b/c?id=1&utm_s=2"  -> "https://ex.com/a&b/c?id=1",
      // a 'ref='-shaped PATH segment is not a tracking param
      "http://ex.com/x&ref=keep/y?utm_a=1" -> "http://ex.com/x&ref=keep/y")
    val got = cases.map(_._1).toDF("u")
      .select(graft.api.Text.normalizeUrl(col("u"))).as[String]
      .collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("boilerplateStats: planted hot shingle counted, rare ones not") {
    // 'x y' appears in 4/5 docs (dfreq 0.8); every other 2-gram is rare
    val corpus = Seq(
      (1L, "x y a b"), (2L, "x y c d"), (3L, "x y e f"), (4L, "x y g h"),
      (5L, "p q r s")
    ).toDF("doc_id", "text")
    val st = graft.api.Text.boilerplateStats(
        corpus, col("doc_id"), col("text"), n = 2, minDocFrac = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1-4: 3 distinct 2-grams each, exactly one ('x y') boilerplate
    assert(st.take(4) == Seq((1L, 3L, 1L), (2L, 3L, 1L),
                             (3L, 3L, 1L), (4L, 3L, 1L)))
    assert(st(4) == ((5L, 3L, 0L)))   // no hot shingles in doc 5
    // frac above the plant's dfreq: nothing is boilerplate
    val none = graft.api.Text.boilerplateStats(
        corpus, col("doc_id"), col("text"), n = 2, minDocFrac = 0.9)
      .agg(sum("n_boiler")).as[Long].collect().head
    assert(none == 0L)
  }

  test("tokenEntropy: uniform = ln k, constant = 0, skew in between") {
    val df = Seq(
      (1L, "a b c d"),          // uniform over 4 → ln 4
      (2L, "a a a a"),          // constant → 0
      (3L, "a a a b")           // skewed → between 0 and ln 2... ln 4
    ).toDF("doc_id", "text")
    val h = graft.api.Text.tokenEntropy(df, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(math.abs(h(0)._3 - math.log(4)) < 1e-12)
    assert(math.abs(h(1)._3) < 1e-12)
    assert(h(2)._3 > 0.0 && h(2)._3 < math.log(4))
    assert(h.forall(_._2 == 4L))
  }

  test("sampleStratified and splitAssign run unchanged on a stream") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val sampled = Pipeline.splitAssign(
      Pipeline.sampleStratified(in.toDF(), col("lang"), col("doc_id"),
        Map("en" -> 1.0), default = 1.0),
      col("doc_id"), buckets = 20, Map(0 -> "test", 1 -> "val"), "train")
    val q = sampled.writeStream.format("memory").queryName("api_stream")
      .outputMode(OutputMode.Append()).start()
    // finally-stopped: a failing assert must not leak a running
    // streaming query (and its temp table) into later suites
    try {
      in.addData(Seq(Doc(1L, "a b", "en"), Doc(2L, "c d", "fr")))
      q.processAllAvailable()
      val rows = spark.table("api_stream")
      assert(rows.count() == 2 && rows.columns.contains("split"))
      // identical decisions to the batch path (incremental equivalence)
      val batch = Pipeline.splitAssign(
        Seq(Doc(1L, "a b", "en"), Doc(2L, "c d", "fr")).toDF(),
        col("doc_id"), buckets = 20, Map(0 -> "test", 1 -> "val"), "train")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val stream = rows.select("doc_id", "split").as[(Long, String)]
        .collect().toMap
      assert(batch == stream)
    } finally q.stop()
  }

  test("Text.bpeTrain: the classic merge sequence, deterministically") {
    // the canonical BPE teaching corpus: low×5 lower×2 newest×6 widest×3
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = graft.api.Text.bpeTrain(docs, col("text"), merges = 4)
    // freq-9 three-way tie (e+s, s+t, t+</w>) resolves lexicographically
    // smallest-first, then each merge re-counts on the MERGED symbols:
    // after est</w>, "w e" survives only in lower (×2) — w pairs with
    // est</w> in newest — so the 4th merge is (l,o) at 7, not (w,e)
    assert(got == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)), got.toString)
    // merges > available pairs terminates early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val all = graft.api.Text.bpeTrain(tiny, col("text"), merges = 99)
    // "ab</w>": (a,b) → (ab,</w>) → single symbol, nothing left
    assert(all == Seq((1, "a", "b", 2L), (2, "ab", "</w>", 2L)),
      all.toString)
    // pair stats agree with the train loop's first-round counts
    // (modulo the </w> marker, which the SQL-facing stats omit)
    val stats = graft.api.Text.bpePairStats(docs, col("text"))
      .as[(String, Long)].collect().toMap
    assert(stats("es") == 9L && stats("st") == 9L && stats("we") == 8L)
  }

  test("Text.bigramLmScore: hand-computed nll on a planted corpus") {
    // corpus: "a b a b" and "a b" → C(a,b)=3, C(b,a)=1, C1(a)=3,
    // C1(b)=1, V=2
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = graft.api.Text
      .bigramLmScore(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, nll) => id -> ((n, nll)) }.toMap
    // doc 2: one bigram (a,b): nll = ln(C1(a)+V) − ln(C(a,b)+1)
    assert(got(2L)._1 == 1L)
    assert(math.abs(got(2L)._2 - (math.log(5) - math.log(4))) < 1e-12)
    // doc 1: (a,b), (b,a), (a,b):
    //   2·[ln5 − ln4] + [ln(1+2) − ln(1+1)], averaged over 3
    val exp1 = (2 * (math.log(5) - math.log(4)) +
                (math.log(3) - math.log(2))) / 3
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - exp1) < 1e-12)
    // single-token docs have no bigrams and drop out
    val one = graft.api.Text.bigramLmScore(
      Seq((9L, "solo")).toDF("doc_id", "text"), col("doc_id"), col("text"))
    assert(one.isEmpty)
  }

  test("Sim.quantizedTopK: exact integer ranking, ties, self-exclusion") {
    // amax = 127 ⇒ scale = 1 ⇒ qvec == the int values themselves
    val vs = Seq(
      (1L, Array(127f, 0f)),     // query
      (2L, Array(127f, 0f)),     // dot 127·127 = 16129
      (3L, Array(0f, 127f)),     // dot 0
      (4L, Array(64f, 127f)),    // dot 127·64 = 8128
      (5L, Array(127f, 0f))      // dup of 2: same dot — id tiebreak
    ).toDF("vec_id", "embedding")
    val got = graft.api.Sim.quantizedTopK(
        vs, col("vec_id"), col("embedding"), col("vec_id") === 1, k = 4)
      .orderBy(col("rn"))
      .as[(Long, Long, Long, Int)].collect()
    assert(got.map(_._2).toSeq == Seq(2L, 5L, 4L, 3L), got.toSeq.toString)
    assert(got.map(_._3).toSeq == Seq(16129L, 16129L, 8128L, 0L))
    assert(!got.exists(_._2 == 1L), "query must not match itself")
  }

  test("Graph.shortestHops: BFS distances, directedness, hop bound") {
    // 1→2→3→4→5 chain plus a shortcut 1→4 and an unreachable island 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
                    (9L, 10L)).toDF("src", "dst")
    val got = graft.api.Graph.shortestHops(spark, edges, 1L, maxHops = 9)
      .as[(Long, Int)].collect().toMap
    // the shortcut wins: dist(4) = 1, dist(5) = 2; the island is absent
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2), s"$got")
    // hop bound truncates (and nothing beyond it leaks in)
    val capped = graft.api.Graph.shortestHops(spark, edges, 1L, maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 4L -> 1), s"$capped")
    // directed: from 5 nothing is reachable
    val sink = graft.api.Graph.shortestHops(spark, edges, 5L, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(sink == Map(5L -> 0), s"$sink")
  }

  test("Etl.expect: null predicate fails the gate; unique/RI catch planted defects") {
    import graft.api.Etl
    val t = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None), (3L, Some(2.0)))
      .toDF("k", "v")
    // NULL v makes `v > 0` UNKNOWN — the gate must count it as a
    // violation, not let it slip
    val gate = Etl.expect(t, Seq("v_positive" -> (col("v") > 0.0)))
      .as[(String, Long, Boolean)].collect().head
    assert(gate == ("v_positive", 2L, false), s"$gate") // -1.0 and NULL
    // planted duplicate key 3
    val uniq = Etl.expectUnique(t, "k_unique", col("k"))
      .as[(String, Long, Boolean)].collect().head
    assert(uniq == ("k_unique", 1L, false), s"$uniq")
    // planted orphan: child 9 has no parent
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 9L, 9L).toDF("fk")
    val ri = Etl.expectRefIntegrity(child, "fk_ok", col("fk"),
                                    parent, col("pk"))
      .as[(String, Long, Boolean)].collect().head
    assert(ri == ("fk_ok", 2L, false), s"$ri")
    // a clean table passes everything
    val clean = Etl.expect(t.filter(col("k") === 1L),
        Seq("v_positive" -> (col("v") > 0.0)))
      .as[(String, Long, Boolean)].collect().head
    assert(clean == ("v_positive", 0L, true), s"$clean")
    // unsafe check names are rejected, not silently quoted
    intercept[IllegalArgumentException] {
      Etl.expect(t, Seq("bad name'" -> (col("v") > 0.0)))
    }
  }

  test("Graph.triangleCounts: planted triangles, hub orientation, no false positives") {
    // triangle {1,2,3}, triangle {1,3,4} (sharing edge 1-3), a dangling
    // path 4-5-6 (zero triangles), and an isolated edge 8-9
    def undirected(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val edges = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
                           (1L, 4L), (4L, 5L), (5L, 6L), (8L, 9L))
    val got = graft.api.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    // node 1 and 3 sit in both triangles; 2 and 4 in one each;
    // 5/6/8/9 in none (absent, not zero-rows)
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L), s"$got")
    // K4: every node in C(3,2)=3 triangles — the orientation emits each
    // triangle exactly once even though all degrees tie
    val k4 = undirected((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
                        (2L, 4L), (3L, 4L))
    val gotK4 = graft.api.Graph.triangleCounts(k4)
      .as[(Long, Long)].collect().toMap
    assert(gotK4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$gotK4")
    // star K1,5: hub with 5 leaves — plenty of wedges, zero triangles
    val star = undirected((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
    assert(graft.api.Graph.triangleCounts(star).isEmpty)
  }

  test("Stats.binnedQuantiles: planted distribution, bin-width error bound, merge-order proof") {
    // 1000 values 0..999 in one key: p50 target = 500th value = 499;
    // with 10 bins of width 100 the 500th value falls in bin 4 →
    // estimate = its upper edge 499 EXACTLY (uniform data lands
    // targets on edges); p99 → bin 9 edge 999
    val df = (0L until 1000L).map(v => ("a", v)).toDF("k", "v")
    val got = graft.api.Stats.binnedQuantiles(
        df, col("k"), col("v"), bins = 10, ps = Seq(50, 99))
      .select("key", "n", "p50_est", "p99_est")
      .as[(String, Long, Long, Long)].head()
    assert(got == (("a", 1000L, 499L, 999L)), s"$got")
    // error bound: estimate within one bin width of the true discrete
    // percentile for a skewed distribution
    val skew = (0 until 1000).map(i => ("s", (i.toLong * i) / 100))
      .toDF("k", "v")
    val (_, n2, p50e, p99e) = graft.api.Stats.binnedQuantiles(
        skew, col("k"), col("v"), bins = 10, ps = Seq(50, 99))
      .select("key", "n", "p50_est", "p99_est")
      .as[(String, Long, Long, Long)].head()
    val vals = (0 until 1000).map(i => (i.toLong * i) / 100).sorted
    val width = (vals.max - vals.min) / 10 + 1
    assert(n2 == 1000L)
    assert(math.abs(p50e - vals(499)) <= width, s"$p50e vs ${vals(499)}")
    assert(math.abs(p99e - vals(989)) <= width, s"$p99e vs ${vals(989)}")
    // merge-order proof: 1 vs 13 partitions, identical estimates
    val wide = graft.api.Stats.binnedQuantiles(
        skew.repartition(13), col("k"), col("v"), bins = 10,
        ps = Seq(50, 99))
      .select("key", "n", "p50_est", "p99_est")
      .as[(String, Long, Long, Long)].head()
    assert(wide == (("s", n2, p50e, p99e)))
  }

  test("Graph.labelPropagation: barbell communities, bridge holds, isolated edge") {
    def undirected(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    // two K4 cliques bridged by a single edge 4-10, plus an isolated
    // edge 20-21: two rounds must collapse each clique to label 1 / 10
    // without the bridge merging them. The isolated PAIR exhibits
    // synchronous LPA's textbook bipartite oscillation — round 1 swaps
    // 20↔21, round 2 swaps them back — so after an even round count
    // each keeps its own id; the point of pinning it is that the
    // oscillation too is deterministic (same labels on any partitioning)
    val barbell = undirected(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L),
      (12L, 13L), (4L, 10L), (20L, 21L))
    val got = graft.api.Graph.labelPropagation(spark, barbell, 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 21L), s"$got")
    // odd round count: the pair sits mid-swap
    val one = graft.api.Graph.labelPropagation(spark, barbell, 1)
      .as[(Long, Long)].collect().toMap
    assert(one(20L) == 21L && one(21L) == 20L, s"$one")
    // determinism under adversarial partitioning: 1-partition and
    // 7-partition runs agree label-for-label
    val once = graft.api.Graph
      .labelPropagation(spark, barbell.coalesce(1), 2)
      .as[(Long, Long)].collect().toMap
    val wide = graft.api.Graph
      .labelPropagation(spark, barbell.repartition(7), 2)
      .as[(Long, Long)].collect().toMap
    assert(once == got && wide == got)
  }

  test("sampleWeighted: max-weight rows always kept, zero weight never, mass tracks weight") {
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, if (i < 20) 1000L else if (i < 40) 0L else 10L))
      .toDF("id", "w")
    val kept = Pipeline.sampleWeighted(df, col("w"), col("id"))
      .as[(Long, Long)].collect()
    // p(keep | w = wmax) = 1 exactly: hash < 65536 always holds
    assert(kept.count(_._2 == 1000L) == 20, "every max-weight row kept")
    assert(kept.count(_._2 == 0L) == 0, "zero-weight rows never kept")
    // w=10 rows keep at rate 10/1000 = 1%: ~20 of 1960 (hash-uniform,
    // generous bound)
    val small = kept.count(_._2 == 10L)
    assert(small > 2 && small < 80, s"got $small")
    // replayable
    val again = Pipeline.sampleWeighted(df, col("w"), col("id"))
      .as[(Long, Long)].collect()
    assert(kept.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("paretoFrontier2D: planted frontier, cross-bucket domination, bucket-width invariance") {
    // minimize x, maximize y. Planted: (1,10) and (5,20) on the
    // frontier; (3,10) dominated by (1,10) [same y, higher x]; (2,5)
    // dominated by (1,10); (9,20) dominated by (5,20); duplicates of a
    // frontier x collapse to its max y
    val pts = Seq((1L, 10L), (3L, 10L), (2L, 5L), (5L, 20L), (9L, 20L),
                  (1L, 4L), (700L, 21L)).toDF("x", "y")
    val want = Set((1L, 10L), (5L, 20L), (700L, 21L))
    val got = Pipeline.paretoFrontier2D(pts, col("x"), col("y"),
                                        bucketWidth = 4L)
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"$got")
    // the cross-bucket prefix must dominate: x=700 sits buckets away
    // from x=9 yet (9,20) still can't sneak in at width 1024 (one
    // bucket) or width 2 (many buckets) — frontier is width-invariant
    for (w <- Seq(1L, 2L, 1024L)) {
      val g = Pipeline.paretoFrontier2D(pts, col("x"), col("y"), w)
        .as[(Long, Long)].collect().toSet
      assert(g == want, s"width $w: $g")
    }
  }

  test("Text.editDistancePairs: equals brute force, short-string path, q-invariance") {
    // classic DP, the spec the filtered join must reproduce exactly
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // mixes: true near-pairs, a dup (distinct() must collapse it),
    // and SHORT strings (len <= q-1+k*q) that the count bound cannot
    // prune — they exercise the all-pair fallback path
    val vocab = Seq("red widget", "red widgot", "red widgets", "blue bolt",
                    "blu bolt", "zz top hats", "ab", "ac", "a", "abcd",
                    "abcdefgh", "abcdefghij", "red widget")
    val df = vocab.map(Tuple1(_)).toDF("s")
    val want = (for {
      a <- vocab.distinct; b <- vocab.distinct if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    val got = graft.api.Text.editDistancePairs(df, col("s"), maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == want, s"got $got\nwant $want")
    // a different gram width changes the FILTER, never the RESULT
    val got3 = graft.api.Text
      .editDistancePairs(df, col("s"), maxDist = 2, q = 3)
      .as[(String, String, Int)].collect().toSet
    assert(got3 == want, s"q=3 diverged: $got3")
    // k=1 is a strict subset at the tighter threshold
    val got1 = graft.api.Text.editDistancePairs(df, col("s"), maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got1 == want.filter(_._3 <= 1), s"k=1: $got1")
  }

  test("Pipeline.temperatureMixT2: uniform exact, skew compressed, budget respected") {
    // 90/10 skew: p = .9/.1 → w ∝ √p → shares ≈ .75/.25 (T=2 upsamples
    // the tail at the expense of the head)
    val df = (Seq.fill(90)("en") ++ Seq.fill(10)("fr")).map(Tuple1(_))
      .toDF("lang")
    val r = Pipeline.temperatureMixT2(df, col("lang"), budget = 1000L)
      .as[(String, Long, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("en")._1 == 90 && r("fr")._1 == 10)
    assert(math.abs(r("en")._2 - 0.75) < 0.01, s"${r("en")._2}")
    assert(math.abs(r("fr")._2 - 0.25) < 0.01, s"${r("fr")._2}")
    // floored targets never exceed the budget, and waste < |groups|+1
    val t = r.values.map(_._3).sum
    assert(t <= 1000 && t >= 997, s"targets sum $t")
    // exact uniform: equal counts → share exactly 0.5 (integer ratio,
    // no float residue)
    val u = Pipeline.temperatureMixT2(
      (Seq.fill(32)("a") ++ Seq.fill(32)("b")).map(Tuple1(_)).toDF("g"),
      col("g"), budget = 100L)
      .as[(String, Long, Double, Long)].collect()
    assert(u.forall(_._3 == 0.5) && u.forall(_._4 == 50L), u.mkString(","))
  }

  test("Pipeline.sampleExactK: k per stratum, short strata whole, partition-invariant") {
    val df = (Seq.tabulate(90)(i => (i.toLong, "big")) ++
      Seq.tabulate(3)(i => (100L + i, "tiny"))).toDF("id", "s")
    val got = Pipeline.sampleExactK(df, col("s"), col("id"), k = 5)
      .as[(Long, String, Int)].collect()
    val byS = got.groupBy(_._2)
    assert(byS("big").length == 5 && byS("tiny").length == 3)
    assert(byS("big").map(_._3).sorted.sameElements(1 to 5))
    // content-addressed: identical selection on any partitioning
    val again = Pipeline.sampleExactK(
      df.repartition(7), col("s"), col("id"), k = 5)
      .as[(Long, String, Int)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("Pipeline.epochShuffle: bijective sharded permutation, seed-sensitive, stable") {
    val df = Seq.tabulate(256)(i => Tuple1(i.toLong)).toDF("id")
    val r = Pipeline.epochShuffle(df, col("id"), seed = "1", shards = 4)
      .as[(Long, Int, Int)].collect()
    assert(r.length == 256 && r.map(_._1).distinct.length == 256)
    assert(r.forall(t => t._2 >= 0 && t._2 < 4))
    // positions within each shard are exactly 1..n (a real permutation,
    // no gaps or dups)
    for ((_, rows) <- r.groupBy(_._2))
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    // another epoch = another permutation (some row moves)
    val r2 = Pipeline.epochShuffle(df, col("id"), seed = "2", shards = 4)
      .as[(Long, Int, Int)].collect()
    assert(r.sortBy(_._1).toSeq != r2.sortBy(_._1).toSeq)
    // replayable on any partitioning
    val again = Pipeline.epochShuffle(
      df.repartition(9), col("id"), seed = "1", shards = 4)
      .as[(Long, Int, Int)].collect()
    assert(r.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("Pipeline.winsorizedMean: outliers clipped to the discrete quantiles") {
    val df = (1 to 100).map(v => ("a", v.toLong)).toDF("g", "v")
    val r = Pipeline.winsorizedMean(df, col("g"), col("v"), 0.05, 0.95)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r.length == 1)
    val (_, lo, hi, n, mean) = r.head
    assert(lo == 5L && hi == 95L && n == 100L)
    // 1..4 → 5 (20) + Σ5..95 (4550) + 96..100 → 95 (475) = 5045 / 100
    assert(mean == 50.45, s"mean $mean")
  }

  test("Pipeline.equiDepthHistogram: equal depths on distinct data, ties collapse") {
    val df = (1 to 1000).map(v => Tuple1(v.toLong)).toDF("v")
    val r = Pipeline.equiDepthHistogram(df, col("v"), buckets = 8)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._2).sum == 1000L)
    assert(r.forall(_._2 == 125L), r.mkString(","))      // perfect depth
    assert(r.head._3 == 1L && r.last._4 == 1000L)
    // contiguous, non-overlapping coverage
    for (Array(a, b) <- r.sliding(2).map(_.toArray))
      assert(a._4 < b._3, s"overlap: $a $b")
    // pathological ties: one value → every row in bucket 0
    val ties = Seq.fill(64)(7L).map(Tuple1(_)).toDF("v")
    val t = Pipeline.equiDepthHistogram(ties, col("v"), buckets = 8)
      .as[(Int, Long, Long, Long)].collect()
    assert(t.length == 1 && t.head._1 == 0 && t.head._2 == 64L)
  }

  test("Events.attributeLastTouch: carry, none-fallback, same-timestamp tie order") {
    val ev = Seq(
      // u1: click, view, purchase (→ view), later purchase carries view
      ("u1", 1L, "click", 1L), ("u1", 2L, "view", 2L),
      ("u1", 3L, "purchase", 3L), ("u1", 5L, "purchase", 4L),
      // u2: purchase BEFORE any touch → none; then click → purchase
      ("u2", 1L, "purchase", 5L), ("u2", 2L, "click", 6L),
      ("u2", 3L, "purchase", 7L),
      // u3: touch and purchase share a timestamp — tieBreak id orders
      // the touch first, so it IS strictly preceding
      ("u3", 7L, "view", 8L), ("u3", 7L, "purchase", 9L),
      // u4: purchase first at the tied timestamp → none
      ("u4", 7L, "purchase", 10L), ("u4", 7L, "view", 11L)
    ).toDF("user", "t", "typ", "id")
    val got = graft.api.Events.attributeLastTouch(
        ev, col("user"), col("t"), Seq(col("id")), col("typ"),
        Seq("click", "view"), "purchase")
      .select(col("id"), col("channel")).as[(Long, String)]
      .collect().toMap
    assert(got == Map(3L -> "view", 4L -> "view", 5L -> "none",
                      7L -> "click", 9L -> "view", 10L -> "none"), got)
  }

  test("Graph.kCore: peeling keeps the dense core, cascades through chains") {
    // K4 on 1..4 (every degree 3) + a 4-5-6 tail + a pendant 1-7.
    // Peeling must CASCADE: removing 6 drops 5 to degree 1, which then
    // falls too — a single-pass degree filter would keep 5 at k=2.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                    (3L, 4L), (4L, 5L), (5L, 6L), (1L, 7L)).toDF("a", "b")
    val c3 = graft.api.Graph.kCore(edges, "a", "b", 3)
      .as[(Long, Long)].collect().toMap
    assert(c3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), c3)
    val c2 = graft.api.Graph.kCore(edges, "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    assert(c2.keySet == Set(1L, 2L, 3L, 4L), c2)
    assert(graft.api.Graph.kCore(edges, "a", "b", 4).isEmpty)
    // reversed duplicates and self-loops canonicalize away
    val messy = edges.union(Seq((2L, 1L), (3L, 3L)).toDF("a", "b"))
    assert(graft.api.Graph.kCore(messy, "a", "b", 3)
      .as[(Long, Long)].collect().toMap == c3)
  }

  test("Text.bpeEncode: greedy lowest-rank equals in-rank-order application") {
    import graft.api.Text
    val corpus = Seq(
      Tuple1(("low " * 5 + "lower " * 2 + "newest " * 6 +
              "widest " * 3).trim)).toDF("text")
    val merges = Text.bpeTrain(corpus, col("text"), merges = 10)
    assert(merges.nonEmpty)
    // reference semantics: each merge applied corpus-style, one
    // left-to-right sweep per rank — the greedy encoder must reproduce
    // it exactly (incl. on "lowest", unseen in training)
    def applyInOrder(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (_, l, r, _) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms
    }
    val words = Seq("low", "lower", "newest", "widest", "lowest")
    val got = Text.bpeEncode(words.map(Tuple1(_)).toDF("w"), col("w"), merges)
      .select(col("w"), col("bpe"), col("n_bpe_tokens"))
      .as[(String, Seq[String], Int)].collect()
    got.foreach { case (w, bpe, n) =>
      assert(bpe == applyInOrder(w), s"$w: $bpe vs ${applyInOrder(w)}")
      assert(n == bpe.length)
    }
    // multi-word rows tokenize with the one tokenizer; nulls encode empty
    val multi = Text.bpeEncode(
      Seq(Tuple1("low\t\nlower"), Tuple1(null: String)).toDF("w"),
      col("w"), merges).select(col("bpe"))
      .as[Seq[String]].collect()
    assert(multi(0) == applyInOrder("low") ++ applyInOrder("lower"))
    assert(multi(1).isEmpty)
  }

  test("Sim.prefixRerankTopK: full-dim rerank of coarse survivors only") {
    // q0 = e1; c11's PREFIX is nearly parallel to q0 but its full
    // vector points far away — coarse must keep it, rerank must demote
    // it; c13's prefix is all-zero — it sits out stage 1 entirely.
    val emb = Seq(
      (0L,  Array(1f, 0f, 0f, 0f)),
      (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(1f, 0.01f, 5f, 5f)),
      (12L, Array(0.9f, 0.1f, 0f, 0f)),
      (13L, Array(0f, 0f, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val r = Sim.prefixRerankTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0L, prefixDims = 2, m = 3, k = 3)
      .select(col("q_id"), col("cand_id"), col("rn"))
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // full-dim order among survivors: c10 (1.0) > c12 (~0.99) > c11
    // (~0.14), even though c11 coarse-ranked second; c13 never appears
    assert(r.map(_._2).toSeq == Seq(10L, 12L, 11L), r.toSeq.toString)
    // with m = 2 the coarse stage keeps {c10, c11} — c12 can never be
    // returned even though its FULL cosine beats c11 (the documented
    // recall contract: rerank ⊆ coarse survivors)
    val r2 = Sim.prefixRerankTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0L, prefixDims = 2, m = 2, k = 2)
      .select(col("cand_id")).as[Long].collect().toSet
    assert(r2 == Set(10L, 11L))
    intercept[IllegalArgumentException] {
      Sim.prefixRerankTopK(emb, col("vec_id"), col("embedding"),
        isQuery = col("vec_id") === 0L, prefixDims = 2, m = 2, k = 3)
    }
  }

  test("Sim.labelCoherence: flipped vector is the worst member") {
    val emb = Seq(
      (1L, Array(1f, 0f), "A"),
      (2L, Array(1f, 0f), "A"),
      (3L, Array(-1f, 0f), "A"),   // disagrees with A's mass
      (4L, Array(0f, 2f), "B"),
      (5L, Array(0f, 0f), "B")     // zero norm: excluded entirely
    ).toDF("vec_id", "embedding", "label")
    val r = Sim.labelCoherence(emb, col("vec_id"), col("embedding"),
        col("label"))
      .select(col("label"), col("n_vecs"), col("avg_coh"),
              col("min_coh"), col("worst_id"))
      .as[(String, Long, Double, Double, Long)].collect()
      .sortBy(_._1).toSeq
    // A: centroid direction (1,0); cosines 1, 1, −1 → avg half-up
    // (10000·1 + 10000·1 − 10000)/3 e4 = 0.3333; worst is the flip
    assert(r == Seq(("A", 3L, 0.3333, -1.0, 3L),
                    ("B", 1L, 1.0, 1.0, 4L)), r.toString)
  }

  test("Sim.gramMatrix + pca1: recovers a planted dominant direction") {
    // cloud = scalar multiples of u plus small orthogonal noise; the
    // Gram matrix's dominant eigenvector must be ±u (pca1 pins the sign
    // so the largest-|component| coordinate is positive, u's is +3)
    val u0 = Array(3.0, 1.0, -2.0, 0.5)
    val n0 = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / n0)
    val ortho = Array(1.0, -3.0, 0.0, 0.0) // ⟂ u0 (3·1 + 1·(−3) = 0)
    val on = math.sqrt(ortho.map(x => x * x).sum)
    val o = ortho.map(_ / on)
    val rows = (1 to 40).map { i =>
      val s = if (i % 2 == 0) i / 10.0 else -i / 10.0
      val eps = (i % 5) * 0.01
      (i.toLong, Array.tabulate(4)(k => (s * u(k) + eps * o(k)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val g = Sim.gramMatrix(df, col("embedding"), dims = 4)
      .as[(Int, Int, Double)].collect()
    assert(g.length == 10, s"expected 10 upper-triangle cells, got ${g.length}")
    val m = Array.ofDim[Double](4, 4)
    g.foreach { case (i, j, v) => m(i)(j) = v; m(j)(i) = v }
    val v1 = Sim.pca1(m)
    val cos = v1.zip(u).map { case (a, b) => a * b }.sum
    assert(cos > 0.999, s"pca1 direction off: cos=$cos v=${v1.mkString(",")}")
    // degenerate zero matrix: returns the (normalized) start vector
    val z = Sim.pca1(Array.ofDim[Double](3, 3))
    assert(math.abs(z.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("Graph.ssspBounded: cheap 2-hop path beats direct edge; rounds bound") {
    import graft.api.Graph
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 20L),
                    (3L, 4L, 1L)).toDF("src", "dst", "w")
    val d4 = Graph.ssspBounded(spark, edges, source = 1L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(d4 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 11L), d4.toString)
    // one sweep can only use single-edge paths: 3 costs 20, 4 unreached
    val d1 = Graph.ssspBounded(spark, edges, source = 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 5L, 3L -> 20L), d1.toString)
  }

  test("kmvSketch: merge property — k-min(A∪B) recoverable from the two sketches") {
    val a = (1 to 40).map(i => ("A", s"u$i")).toDF("g", "v")
    val b = (25 to 70).map(i => ("B", s"u$i")).toDF("g", "v")
    val k = 8
    val skA = Pipeline.kmvSketch(a, col("g"), col("v"), k)
      .select("hv").as[Long].collect().toSet
    val skB = Pipeline.kmvSketch(b, col("g"), col("v"), k)
      .select("hv").as[Long].collect().toSet
    assert(skA.size == k && skB.size == k)
    val direct = Pipeline.kmvSketch(
        a.unionByName(b).withColumn("g", lit("U")),
        col("g"), col("v"), k)
      .select("hv").as[Long].collect().toSet
    val merged = (skA ++ skB).toSeq.sorted.take(k).toSet
    assert(merged == direct,
      s"merge property violated: $merged vs $direct")
  }

  test("Etl.observeExpectations: counters ride the caller's action for free") {
    import graft.api.Etl
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 10.0), (4L, -2.0))
      .toDF("id", "v")
      .withColumn("v", when(col("id") === 4L, lit(null)
        .cast("double")).otherwise(col("v")))
    val (audited, obs) = Etl.observeExpectations(df, Seq(
      "v_positive" -> (col("v") > 0),
      "id_small" -> (col("id") < 100)))
    // the metrics materialize as a side effect of THIS action —
    // no separate aggregate job over the data
    assert(audited.count() == 4)
    val m = obs.get
    // -1.0 fails, NULL counts as a violation (3-valued logic must not
    // slip unknown rows through a gate)
    assert(m("viol_v_positive") == 2L, m.toString)
    assert(m("viol_id_small") == 0L, m.toString)
    // matches the separate-scan expect() verdict exactly
    val e = Etl.expect(df, Seq("v_positive" -> (col("v") > 0)))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(e == Seq(("v_positive", 2L, false)), e.toString)
  }

  test("Privacy.tCloseness: skewed class scores its TVD, balanced class 0") {
    import graft.api.Privacy
    // global seg distribution: 6 x, 6 y (50/50). class A: 4x+0y →
    // TVD = ½(|4/4−1/2| + |0−1/2|) = 0.5; class B: 2x+2y ... wait —
    // B has 2x+6y? keep exact: A = 4x, B = 2x+6y → global 6x+6y.
    // B's TVD = ½(|2/8−6/12| + |6/8−6/12|) = ½(0.25 + 0.25) = 0.25
    val df = (Seq.fill(4)(("A", "x")) ++ Seq.fill(2)(("B", "x")) ++
        Seq.fill(6)(("B", "y"))).toDF("k", "seg")
    val r = Privacy.tCloseness(df, Seq(col("k")), col("seg"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(("A", 4L, 0.5), ("B", 8L, 0.25)), r.toString)
  }

  test("Sim.rrfFuse: doc in both lists outranks singles; integer scores") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("_id", "rank")
    val l2 = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("_id", "rank")
    val r = Sim.rrfFuse(Seq(l1, l2), k0 = 60, k = 4)
      .as[(Long, Long)].collect().toSeq
    // 10: ⌊1e6/61⌋+⌊1e6/63⌋ = 16393+15873 = 32266
    // 20: ⌊1e6/62⌋+⌊1e6/61⌋ = 16129+16393 = 32522
    // 30: 15873; 40: 16129
    assert(r == Seq((20L, 32522L), (10L, 32266L), (40L, 16129L),
                    (30L, 15873L)), r.toString)
  }

  test("Sim.silhouette: tight planted clusters score near 1, straddler drags") {
    val cents = Seq((0L, Array(10f, 0f)), (1L, Array(0f, 10f)))
      .toDF("cell", "centroid")
    val emb = Seq(
      (100L, Array(10f, 0f)),   // exactly on centroid 0 → s = 1
      (101L, Array(9f, 0f)),    // near 0 → s close to 1
      (102L, Array(0f, 10f)),   // exactly on centroid 1 → s = 1
      (103L, Array(5f, 5f))     // equidistant → a²=b² → s = 0
    ).toDF("vec_id", "embedding")
    val r = Sim.silhouette(emb, col("vec_id"), col("embedding"), cents)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // straddler ties (a²=b²) break to the LOWER cell id → lands in 0
    assert(r.map(t => (t._1, t._2)) == Seq((0L, 3L), (1L, 1L)), r.toString)
    val c0 = r.head._3 // (1 + ~0.9876 + 0) / 3 — dominated by the two
    assert(c0 > 0.6 && c0 < 0.7, s"cell0 avg: $c0")
    assert(r(1)._3 == 1.0, r.toString)
  }

  test("Stats.countMin: never undercounts; row sums conserve; depth-min tightens") {
    import graft.api.Stats
    val keys = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val df = keys.map(Tuple1(_)).toDF("k")
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = keys.distinct.map(Tuple1(_)).toDF("k")
    val c4 = Stats.countMinCounters(df, col("k"), depth = 4, width = 8)
    val est4 = Stats.countMinEstimate(c4, probes, col("k"), 4, 8)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(est4(k) >= n, s"undercount at $k: ${est4(k)} < $n") }
    // each hash row distributes every input row exactly once
    val rowSums = c4.groupBy("r").agg(sum("c")).as[(Int, Long)].collect()
    assert(rowSums.length == 4 && rowSums.forall(_._2 == keys.size),
      rowSums.mkString(","))
    // the min over 4 rows can only tighten the single-row estimate
    // (row 0 is shared between the two sketches by construction)
    val c1 = Stats.countMinCounters(df, col("k"), depth = 1, width = 8)
    val est1 = Stats.countMinEstimate(c1, probes, col("k"), 1, 8)
      .as[(String, Long)].collect().toMap
    exact.keys.foreach { k => assert(est4(k) <= est1(k)) }
    // width 8 << 50 keys: collisions must actually occur, or the
    // tightening claim above was tested on nothing
    assert(exact.exists { case (k, n) => est1(k) > n })
  }

  test("Privacy: kAnonAudit / lDiversity / generalizeLadder on planted classes") {
    import graft.api.Privacy
    // nation A: classes (x:4 rows, y:1 row); nation B: (x:5 rows)
    val df = (Seq.fill(4)(("A", "x")) ++ Seq(("A", "y")) ++
        Seq.fill(5)(("B", "x"))).toDF("nation", "seg")
    val audit = Privacy.kAnonAudit(
        df, Seq(col("nation"), col("seg")), "nation", k = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(audit == Seq(("A", 2L, 2L, 5L, 5L, 1L),
                        ("B", 1L, 0L, 0L, 5L, 5L)), audit.toString)

    val ld = Privacy.lDiversity(df, Seq(col("nation")), col("seg"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ld == Seq(("A", 5L, 2L), ("B", 5L, 1L)), ld.toString)

    // 10 unit values 0..9, no static QI: width 1 → 10 singleton
    // classes (all risky at k=3); width 5 → two classes of 5; width
    // 10 → one class of 10
    val vals = (0L until 10L).map(Tuple1(_)).toDF("v")
    val ladder = Privacy.generalizeLadder(
        vals, Seq.empty, col("v"), widths = Seq(1L, 5L, 10L), k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ladder == Seq((1L, 10L, 1L, 10L, 10L),
                         (5L, 2L, 5L, 0L, 10L),
                         (10L, 1L, 10L, 0L, 10L)), ladder.toString)
  }

  test("Sim.pairwiseDiversity: duplicates 1.0, orthogonal 0.0, antipodal -1.0, n<2 dropped") {
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val e3 = Array(0f, 0f, 1f, 0f)
    val neg = Array(-1f, 0f, 0f, 0f)
    val df = Seq(
      (1L, e1, "dup"), (2L, e1, "dup"), (3L, e1, "dup"),
      (4L, e1, "orth"), (5L, e2, "orth"), (6L, e3, "orth"),
      (7L, e1, "anti"), (8L, neg, "anti"),
      (9L, e1, "single")
    ).toDF("vec_id", "embedding", "g")
    val r = graft.api.Sim.pairwiseDiversity(
        df, col("embedding"), col("g"), dims = 4)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(("anti", 2L, -1.0), ("dup", 3L, 1.0),
                    ("orth", 3L, 0.0)), r.toString)
    // one-pass identity matches the O(n²) definition on a mixed group
    val mixed = Seq((1L, e1, "m"), (2L, e1, "m"), (3L, e2, "m"))
      .toDF("vec_id", "embedding", "g")
    val got = graft.api.Sim.pairwiseDiversity(
        mixed, col("embedding"), col("g"), dims = 4)
      .as[(String, Long, Double)].collect().head._3
    // pairs: (e1,e1)=1, (e1,e2)=0, (e1,e2)=0 → mean 1/3
    assert(got == math.rint(1.0 / 3.0 * 10000) / 10000)
  }

  test("Pipeline.sampleBalanced: min-class k, sampleExactK order, partition-invariant") {
    val df = (Seq.tabulate(90)(i => (i.toLong, "big")) ++
      Seq.tabulate(3)(i => (100L + i, "tiny"))).toDF("id", "s")
    val got = Pipeline.sampleBalanced(df, col("s"), col("id"))
      .as[(Long, String, Int)].collect()
    val byS = got.groupBy(_._2)
    assert(byS("big").length == 3 && byS("tiny").length == 3)
    // the balanced pick IS the exact-k pick at k = min class size
    val ek = Pipeline.sampleExactK(df, col("s"), col("id"), k = 3)
      .as[(Long, String, Int)].collect()
    assert(got.sortBy(_._1).sameElements(ek.sortBy(_._1)))
    val again = Pipeline.sampleBalanced(
      df.repartition(7), col("s"), col("id"))
      .as[(Long, String, Int)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("Pipeline.waterfill: exact integer max-min allocation, Σalloc = T") {
    def run(ws: Seq[(String, Long)], num: Long = 1, den: Long = 2) =
      graft.api.Pipeline.waterfill(
          ws.toDF("g", "w"), col("g"), col("w"), num, den)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // level 3 fills a and b whole, caps c
    assert(run(Seq("a" -> 1L, "b" -> 2L, "c" -> 9L)) ==
      Seq(("a", 1L, 1L), ("b", 2L, 2L), ("c", 9L, 3L)))
    // equal big sources split the level evenly
    assert(run(Seq("a" -> 1L, "b" -> 5L, "c" -> 5L)) ==
      Seq(("a", 1L, 1L), ("b", 5L, 2L), ("c", 5L, 2L)))
    // mod remainder goes to the FIRST unfilled source by name
    assert(run(Seq("a" -> 1L, "b" -> 6L, "c" -> 6L)) ==
      Seq(("a", 1L, 1L), ("b", 6L, 3L), ("c", 6L, 2L)))
    // full budget returns every source whole
    assert(run(Seq("a" -> 1L, "b" -> 2L, "c" -> 9L), num = 1, den = 1)
      .map(t => t._2 == t._3).forall(identity))
    // Σalloc = T in every case
    assert(run(Seq("a" -> 7L, "b" -> 13L, "c" -> 29L, "d" -> 2L))
      .map(_._3).sum == (7 + 13 + 29 + 2) / 2)
  }

  test("Etl.compactionPlan: streaming fill closes outputs at the target, never splits") {
    val files = Seq((1L, 3L), (2L, 4L), (3L, 3L), (4L, 10L), (5L, 1L))
      .toDF("k", "r")
    val plan = graft.api.Etl.compactionPlan(
        files, col("k"), col("r"), targetRows = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(plan == Seq((0L, 2L, 7L, 1L, 2L), (1L, 1L, 3L, 3L, 3L),
                       (2L, 1L, 10L, 4L, 4L), (4L, 1L, 1L, 5L, 5L)),
      plan.toString)
  }

  test("Etl.tableChecksum: order/partitioning-independent, content-sensitive") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("id", "v")
    val repr = concat_ws("|", col("id"), col("v"))
    def sums(d: org.apache.spark.sql.DataFrame) =
      graft.api.Etl.tableChecksum(d, lit("all"), repr)
        .as[(String, Long, Long)].collect().head
    val base = sums(df)
    assert(base._2 == 100)
    // any partitioning / row order yields the identical digest
    assert(sums(df.repartition(7)) == base)
    assert(sums(df.orderBy(col("v").desc)) == base)
    // one changed cell changes the digest
    val mut = df.withColumn("v",
      when(col("id") === 42, lit("poked")).otherwise(col("v")))
    assert(sums(mut)._3 != base._3)
  }

  test("Graph.kCore: maxRounds bounds the peel; fixpoint empties a path") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    // fixpoint: a path has no 2-core
    assert(graft.api.Graph.kCore(path, "a", "b", k = 2).isEmpty)
    // one bounded round peels only the current endpoints
    val r1 = graft.api.Graph.kCore(path, "a", "b", k = 2, maxRounds = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(r1 == Seq((2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L)), r1.toString)
    // bounding at/after convergence equals the fixpoint
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val fx = graft.api.Graph.kCore(tri, "a", "b", k = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val bounded = graft.api.Graph.kCore(tri, "a", "b", k = 2,
        maxRounds = 5)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fx == bounded && fx == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
