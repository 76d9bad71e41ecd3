package graft

import graft.operators._
import graft.functions.{Kernels, TextFns, VectorFns}

import org.apache.spark.sql.functions._

/** Invariant tests for the pipeline operators, independent of the DuckDB
  * oracle: planted duplicates are found, similarity metrics behave at their
  * fixed points, language ID recognizes scripts, ANN recall is sane. */
class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("exact dedup groups identical texts and keeps min id") {
    val planted = docs.select($"doc_id" + 100000L as "doc_id", $"text").limit(5)
    val d = docs.select($"doc_id", $"text").union(planted)
    val res = Dedup.exact(d, "doc_id", "text")
    assert(res.filter($"n_copies" === 2).count() == 5)
    // canonical id is the original (smaller) one
    assert(res.filter($"n_copies" === 2).filter($"keep_id" >= 100000L).count() == 0)
  }

  test("minhash: identical docs share full signature; pairs found") {
    val planted = docs.select($"doc_id" + 100000L as "doc_id", $"text").limit(3)
    val d = docs.select($"doc_id", $"text").union(planted)
    val pairs = Dedup.minhashPairs(d, "doc_id", "text", numHashes = 4, bandSize = 2).collect()
    val exactPairs = pairs.filter(r => r.getLong(1) - r.getLong(0) == 100000L)
    assert(exactPairs.length == 3, s"expected 3 planted pairs, got ${pairs.length} total")
  }

  test("simhash of identical docs is equal; near-identical within hamming 3") {
    val fp = Dedup.simhash(docs.limit(10), "doc_id", "text")
    val fp2 = Dedup.simhash(docs.limit(10), "doc_id", "text")
    assert(fp.collect().toSeq == fp2.collect().toSeq)
    val planted = docs.select($"doc_id" + 100000L as "doc_id",
      concat($"text", lit(" extra")) as "text").limit(3)
    val d = docs.select($"doc_id", $"text").union(planted)
    val pairs = Dedup.simhashPairs(d, "doc_id", "text").collect()
    assert(pairs.count(r => r.getLong(1) - r.getLong(0) == 100000L) >= 2)
  }

  test("ngram jaccard: identical texts give 1.0") {
    val planted = docs.select($"doc_id" + 100000L as "doc_id", $"text",
      $"lang").limit(3)
    val d = docs.select($"doc_id", $"text", $"lang").union(planted)
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", "lang", threshold = 0.99)
    assert(pairs.filter($"jaccard" === 1.0).count() >= 3)
  }

  test("prefix-filtered jaccard pairs equal the blocked-exact pairs") {
    // the prefix inverted index is a lossless candidate generator: output
    // must be SET-IDENTICAL to the all-in-block comparison at any threshold
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val blocked = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", "lang", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(prefix == blocked, s"threshold $t: prefix path diverged")
      // the anti-skew salted replicated join must be pair-for-pair lossless
      val salted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = t,
        broadcastRight = false, saltBuckets = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == blocked, s"threshold $t: salted path diverged")
    }
  }

  test("connected components: planted chain and clique collapse to min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (10L, 12L), (11L, 12L), // clique 10,11,12
      (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    assert(comp.size == 9)
  }

  test("connected components: 200-hop chain converges (pointer jumping) without leaking cache") {
    // Diameter 200 would need 200 rounds of plain min-label propagation;
    // pointer jumping must settle within the default maxIter=30 (2^30 reach).
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val comp = Dedup.connectedComponents(chain, "id_a", "id_b")
    val rows = comp.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == 201 && rows.forall(_._2 == 0L))
    // Leak check: the run may add at most the returned result's own
    // checkpoint — every per-round intermediate must be unpersisted.
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1, s"leaked ${after - before} cached RDDs in one run")
  }

  test("withConnectedComponents: cluster+keep pipeline leaves ZERO net cached RDDs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val corpus = Seq(1L, 2L, 3L, 5L, 10L, 11L, 12L).toDF("doc_id")
    // set-diff, not count-diff: the shared test SparkContext may be cleaning
    // OTHER suites' stale blocks in the background, which must not mask (or
    // fake) a leak from THIS call
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val kept = Dedup.withConnectedComponents(pairs, "id_a", "id_b") { comp =>
      Dedup.keepCanonical(corpus, "doc_id", comp).collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(kept == Seq(1L, 5L, 10L, 12L))
    val leaked = spark.sparkContext.getPersistentRDDs -- before
    assert(leaked.isEmpty,
      s"scoped pipeline leaked cached RDDs: ${leaked.values.map(r => s"${r.id}:${r.name}").mkString(", ")}")
  }

  test("Residuals.release drops every registered operator cache (serving-session hygiene)") {
    // the r10 verdict's storage-creep finding: pagerank/basket/CC leave
    // caches "for the caller's lifetime" — the registry makes that lifetime
    // END at a consume-boundary instead of at session death
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val pr = Graph.pagerank(edges, "s", "d", iters = 9, checkpointEvery = 4)
    assert(pr.count() == 4)
    val baskets = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"))
      .toDF("bkt", "item")
    assert(Basket.coOccurrence(baskets, "bkt", "item", 1L).count() > 0)
    assert(graft.operators.Residuals.pending > 0)
    graft.operators.Residuals.release()
    assert(graft.operators.Residuals.pending == 0)
    // releases are async (blocking=false): poll briefly for the empty tab
    val deadline = System.nanoTime() + 10e9.toLong
    var leaked = spark.sparkContext.getPersistentRDDs -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = spark.sparkContext.getPersistentRDDs -- before
    }
    assert(leaked.isEmpty,
      s"registered caches survived release: ${leaked.values.map(r => s"${r.id}:${r.name}").mkString(", ")}")
  }

  test("Residuals scopes isolate two sequential harnesses in one JVM") {
    // the r11 single-consumer footgun: a process-global release dropped
    // EVERY registered residual, including another harness's. With scopes,
    // each harness's release drains only its own registrations.
    import graft.operators.Residuals
    val df1 = spark.range(10).toDF("a")
    val df2 = spark.range(20).toDF("b")
    val s1 = Residuals.newScope()
    val s2 = Residuals.newScope()
    Residuals.withScope(s1) {
      Residuals.persist(df1)
      assert(Residuals.pending == 1) // current-scope view inside the scope
    }
    Residuals.withScope(s2) { Residuals.persist(df2); df2.count() }
    assert(s1.pending == 1 && s2.pending == 1)
    s1.release() // harness 1's consume boundary
    assert(s1.pending == 0 && s2.pending == 1, "scope 1 release touched scope 2")
    assert(df2.storageLevel.useMemory, "scope 2's cache was dropped by scope 1's release")
    Residuals.withScope(s2) { Residuals.release() } // boundary via the static API
    assert(s2.pending == 0)
    assert(Residuals.pending == 0, "default scope picked up scoped registrations")
  }

  test("canonicalUrl: ports, fragments, tracking params, slashes, malformed passthrough") {
    import org.apache.spark.unsafe.types.UTF8String
    def c(s: String) = graft.functions.Kernels.canonicalUrl(UTF8String.fromString(s)).toString
    assert(c("HTTP://Ex.COM:80/A/b/?utm_source=x&b=2&a=1#frag") == "http://ex.com/A/b?a=1&b=2")
    assert(c("https://ex.com:8443/p") == "https://ex.com:8443/p") // non-default port kept
    assert(c("http://ex.com:443/p") == "http://ex.com:443/p") // 443 is not http's default
    assert(c("https://ex.com/") == "https://ex.com/") // root slash kept
    assert(c("https://ex.com") == "https://ex.com/") // empty path becomes root
    assert(c("https://ex.com/p?") == "https://ex.com/p") // empty query dropped
    assert(c("https://ex.com/p?gclid=1&&x=1") == "https://ex.com/p?x=1") // empties + tracking
    assert(c("https://ex.com/p?ref=main") == "https://ex.com/p?ref=main") // ref is load-bearing, kept
    assert(c("not a url") == "not a url") // malformed: unchanged, never dropped
    assert(c("https://ex.com/p?id=1&id=0") == "https://ex.com/p?id=0&id=1") // stable byte sort
  }

  test("temperatureAlloc: sqrt weights, exact hand split, budget conservation bound") {
    import graft.operators.Sampling
    // n = 100/400 -> w_milli = 10000/20000 -> 1:2 split of 300
    val docs = ((1 to 100).map(i => (i.toLong, "lo")) ++ (1 to 400).map(i => (i.toLong + 1000, "hi")))
      .toDF("doc_id", "lang")
    val r = Sampling.temperatureAlloc(docs, "lang", budget = 300L)
      .orderBy("stratum").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("hi", 400L, 20000L, 200L), ("lo", 100L, 10000L, 100L)))
    // truncating division never over-allocates
    assert(r.map(_._4).sum <= 300L)
  }

  test("calibration: bin edges clamp, perfect calibration has zero gap") {
    import graft.operators.Eval
    // p = 1e6 lands in the LAST bin (clamped), not bin 10
    val edge = Seq((1000000L, 1L), (0L, 0L)).toDF("p", "y")
    val eb = Eval.calibration(edge, col("p"), col("y"), bins = 10)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(eb.toSeq == Seq((0L, 1L), (9L, 1L)))
    // 4 rows at p=250000 with exactly 1 positive => mean_pred == pos_rate
    val cal = Seq.tabulate(4)(i => (250000L, if (i == 0) 1L else 0L)).toDF("p", "y")
    val row = Eval.calibration(cal, col("p"), col("y"), bins = 10).head()
    assert(row.getAs[Long]("mean_pred_micro") == 250000L)
    assert(row.getAs[Long]("pos_rate_micro") == 250000L)
    assert(row.getAs[Long]("gap_micro") == 0L)
  }

  test("asofJoin: inclusive boundary, no value resurrection across NULL fields, unmatched -> NULL") {
    import graft.operators.AsOf
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 50L))
      .toDF("event_id", "k", "t")
    // newest right row at t=20 carries a NULL price: the as-of result at
    // t=25 must keep that NULL, not resurrect t=10's 100.0
    val right = Seq((1L, 10L, 7L, Some(100.0)), (1L, 20L, 9L, None))
      .toDF("k", "t", "ok", "price")
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "t", Seq("ok", "price"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == Seq(
      (1L, None, None), // before any right row
      (2L, Some(7L), Some(100.0)), // EQUAL timestamp is visible (inclusive)
      (3L, Some(9L), None), // newest row wins field-for-field
      (4L, None, None))) // key never matched
  }

  test("asofJoinForward: earliest future row, inclusive equal timestamp, trailing -> NULL") {
    import graft.operators.AsOf
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 50L))
      .toDF("event_id", "k", "t")
    val right = Seq((1L, 10L, 7L), (1L, 20L, 9L)).toDF("k", "t", "ok")
    val got = AsOf.asofJoinForward(left, right, "k", "k", "t", "t", Seq("ok"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      (1L, Some(7L)), // next row is t=10
      (2L, Some(7L)), // EQUAL timestamp is visible (inclusive >=)
      (3L, None), // nothing after t=25
      (4L, None))) // key never matched
  }

  test("latestPerKeyTime keeps exactly the highest-tiebreak row per (key, time)") {
    import graft.operators.AsOf
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 20L, 3L), (2L, 10L, 1L))
      .toDF("k", "t", "ok")
    val got = AsOf.latestPerKeyTime(right, "k", "t", "ok")
      .orderBy("k", "t").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L, 9L), (1L, 20L, 3L), (2L, 10L, 1L)))
  }

  test("rangeJoin.bucketed equals the naive inequality join (overlaps, bounds, multi-bucket spans)") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 15.0), (4L, 99.0), (5L, 20.0))
      .toDF("pid", "v")
    // overlapping intervals; one spans many buckets; hi is exclusive
    val intervals = Seq((10L, 0.0, 12.0), (20L, 8.0, 16.0), (30L, 4.0, 90.0), (40L, 20.0, 20.0))
      .toDF("iid", "lo", "hi")
    for (w <- Seq(1.0, 3.0, 100.0)) {
      val got = RangeJoin.bucketed(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.crossJoin(intervals)
        .filter($"v" >= $"lo" && $"v" < $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth $w diverged from naive join")
    }
    // pid=2 at v=10: inside [0,12), [8,16), [4,90) — 3 matches; empty [20,20) matches nothing
    assert(RangeJoin.bucketed(points, "v", intervals, "lo", "hi", 3.0)
      .filter($"pid" === 2L).count() == 3)
  }

  test("KMV sketch: exact below k, bounded state, merge == k-min of union") {
    import graft.operators.Sketches
    val agg = new Sketches.KMinValues(8)
    val xs = Seq(50L, 10L, 30L, 10L, 90L, 20L, 70L, 40L, 60L, 80L, 5L, 100L)
    val reduced = xs.foldLeft(agg.zero)(agg.reduce)
    assert(reduced.toSeq == xs.distinct.sorted.take(8), "reduce must keep the k smallest distinct")
    val (l, r) = xs.splitAt(5)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == reduced.toSeq, "merge must equal single-pass reduce")
    assert(merged.length <= 8)

    // exact when distinct < k; ~1/sqrt(k-2) accuracy above it
    val df = (0 until 5000).map(i => (if (i < 10) "small" else "big", i.toLong))
      .toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 10.0, s"small group must be exact, got ${est("small")}")
    assert(math.abs(est("big") - 4990.0) / 4990.0 < 0.5, s"big group estimate off: ${est("big")}")
  }

  test("keepCanonical drops exactly the non-minimum cluster members") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val corpus = Seq(1L, 2L, 3L, 5L, 10L, 11L, 12L).toDF("doc_id")
    val kept = Dedup.keepCanonical(corpus, "doc_id",
      Dedup.connectedComponents(pairs, "id_a", "id_b"))
      .collect().map(_.getLong(0)).sorted.toSeq
    // 2,3 fold into 1; 11 folds into 10; untouched docs 5 and 12 survive
    assert(kept == Seq(1L, 5L, 10L, 12L))
  }

  test("frame sample: n rows per doc, monotone offsets within payload bounds") {
    val f = Multimodal.frameSample(
      Multimodal.withBinaryMeta(docs.limit(20), "doc_id", "text"), "doc_id", 4)
    val rows = f.collect()
    assert(rows.length == 80)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { fr =>
      val sorted = fr.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
      val offs = sorted.map(_.getLong(3))
      assert(offs.head == 0L && offs.sameElements(offs.sorted))
      val ts = sorted.map(_.getLong(2))
      assert(ts.forall(_ >= 0L) && ts.sameElements(ts.sorted))
    }
  }

  test("embedding near-dup: identical vectors give cosine 1.0") {
    val planted = embs.select($"vec_id" + 100000L as "vec_id", $"embedding").limit(3)
    val e = embs.select($"vec_id", $"embedding").union(planted)
    val pairs = Dedup.embeddingNearDupBrute(e, "vec_id", "embedding", 0.999)
    assert(pairs.filter($"id_b" - $"id_a" === 100000L).count() == 3)
  }

  test("dupSpans: planted shared run yields one maximal span in each doc") {
    // doc 1: 20 unique tokens; doc 2 embeds doc 1's tokens 5..14 (10 tokens)
    // between unique context -> with window 4, windows 5..11 are shared in
    // both docs and must merge into ONE span [5, 15) per doc
    val t1 = (1 to 20).map(i => s"a$i").mkString(" ")
    val t2 = (Seq("b1", "b2", "b3", "b4") ++ (5 to 14).map(i => s"a$i")
      ++ Seq("c1", "c2")).mkString(" ")
    val d = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(d, "doc_id", "text", window = 4)
      .orderBy($"doc_id").collect()
    assert(spans.length == 2, spans.mkString("; "))
    spans.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 15L && r.getLong(3) == 7L,
        s"unexpected span $r")
    }
  }

  test("bpeTokenCount splits contractions, digit runs and punctuation runs") {
    val d = Seq((1L, "it's 123 foo-bar!"), (2L, "")).toDF("doc_id", "text")
    val r = d.select($"doc_id", TextFns.bpeTokenCount($"text").as("n"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    // it | 's | " 123" | " foo" | - | bar | !  => 7 pre-tokens
    assert(r(1L) == 7, s"got ${r(1L)}")
    assert(r(2L) == 0)
  }

  test("bm25: ranks contiguous, scores non-increasing, rare term dominates") {
    val res = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("dup", "scan", "window"), k = 10).collect()
    assert(res.nonEmpty && res.length <= 10)
    assert(res.map(_.getLong(1)).toSeq == (1L to res.length))
    val scores = res.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the rare term has strongly positive idf, common terms negative: the
    // top-ranked doc must contain the rare term
    val topDoc = docs.filter($"doc_id" === res.head.getLong(0))
      .select($"text").head().getString(0)
    assert(topDoc.split("\\s+").contains("dup"))
  }

  test("semantic dedup: planted twin is dropped, its original kept, decisions consistent") {
    val planted = embs.select($"vec_id" + 100000L as "vec_id", $"embedding").limit(3)
    val e = embs.select($"vec_id", $"embedding").union(planted)
    val res = Dedup.semanticDedup(e, "vec_id", "embedding", 0.999).collect()
    assert(res.length == e.count())
    val keep = res.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // a planted twin shares its original's cell (identical vector) and has
    // the larger id, so it must be dropped while the original survives
    val twins = res.map(_.getLong(0)).filter(_ >= 100000L)
    assert(twins.length == 3)
    twins.foreach { id =>
      assert(keep(id) == 0L, s"twin $id not dropped")
      assert(keep(id - 100000L) == 1L, s"original ${id - 100000L} not kept")
    }
  }

  test("knn: nearest neighbor of a duplicated vector is its twin") {
    val planted = embs.select($"vec_id" + 100000L as "vec_id", $"embedding").limit(5)
    val corpus = embs.select($"vec_id", $"embedding").union(planted)
    val res = Similarity.bruteForceKnn(corpus, planted, "vec_id", "embedding", 1).collect()
    res.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) - 100000L,
        s"query ${r.getLong(0)} nearest was ${r.getLong(2)}")
    }
  }

  test("resizePlan: fit-within bound, no upscale, aspect preserved in integer math") {
    val r = Multimodal.resizePlan(Multimodal.decodeStub(
      Multimodal.withBinaryMeta(docs, "doc_id", "text"), "doc_id"), "doc_id").collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (w, h, ow, oh) = (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))
      assert(ow <= w && oh <= h, "upscaled")
      assert(math.max(ow, oh) <= 224)
      if (math.max(w, h) > 224) {
        assert(math.max(ow, oh) == 224, s"downscale must hit the bound: $x")
        // integer floor of the exact ratio
        assert(ow == w * 224 / math.max(w, h) && oh == h * 224 / math.max(w, h))
      } else assert(ow == w && oh == h)
    }
  }

  test("appendIvfIndex is partition-local and probes like a full rebuild") {
    val base = embs.filter($"vec_id" < 150)
    val delta = embs.filter($"vec_id" >= 150 && $"vec_id" < 160)
    val dirApp = java.nio.file.Files.createTempDirectory("ivf_app").toString
    val dirFull = java.nio.file.Files.createTempDirectory("ivf_full").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", dirApp)
    def listing(): Map[String, Set[String]] =
      new java.io.File(dirApp).listFiles().filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = listing()
    Similarity.appendIvfIndex(delta, "vec_id", "embedding", dirApp)
    val after = listing()
    // the delta landed in a strict subset of cells; every untouched cell's
    // file listing is byte-for-byte the same (no rewrite of existing data)
    val touched = after.keySet.filter(k => !before.contains(k) || before(k) != after(k))
    assert(touched.nonEmpty && touched.size < after.size, s"touched=$touched")
    (after.keySet -- touched).foreach(k => assert(before(k) == after(k), k))
    // the grown index answers probes exactly like a full rebuild
    val corpus = base.union(delta)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", dirFull)
    val q = corpus.filter($"vec_id" < 10)
    val a = Similarity.ivfIndexKnn(spark.read.parquet(dirApp), q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Similarity.ivfIndexKnn(spark.read.parquet(dirFull), q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("negativeSample: k per anchor, never from the anchor's cell, growth-stable") {
    val anchors = embs.filter($"vec_id" < 5)
    val r = Similarity.negativeSample(embs, anchors, "vec_id", "embedding", 3).collect()
    assert(r.length == 15)
    assert(r.groupBy(_.getLong(0)).forall(_._2.map(_.getLong(1)).sorted.sameElements(Seq(1L, 2L, 3L))))
    assert(r.forall(x => x.getLong(2) != x.getLong(0)), "anchor sampled as its own negative")
    // growth stability: adding corpus rows changes at most the displaced picks
    val r2 = Similarity.negativeSample(embs.filter($"vec_id" < 400), anchors,
      "vec_id", "embedding", 3).collect()
    val full = r.map(x => (x.getLong(0), x.getLong(2))).toSet
    val sub = r2.map(x => (x.getLong(0), x.getLong(2))).toSet
    // picks from the smaller corpus that survive in the larger one keep rank
    // order; at minimum the sample is deterministic and non-empty both ways
    assert(sub.nonEmpty && full.nonEmpty)
    val again = Similarity.negativeSample(embs, anchors, "vec_id", "embedding", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(again == r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet)
  }

  test("lsh ann achieves reasonable recall vs brute force") {
    val queries = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshKnn(embs, queries, "vec_id", "embedding", 5, planes = 4)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall too low") // 4 planes, single probe
    assert(lsh.nonEmpty)
  }

  test("ivf ann: cells partition the corpus; twin vectors land in one cell; recall sane") {
    val queries = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall too low for nprobe=4/16 cells")
    // a duplicated vector is assigned to the same cell, so its twin is always found
    val planted = embs.select($"vec_id" + 100000L as "vec_id", $"embedding").limit(5)
    val corpus = embs.select($"vec_id", $"embedding").union(planted)
    val res = Similarity.ivfKnn(corpus, planted, "vec_id", "embedding", 1)
    res.collect().foreach(r => assert(r.getLong(2) == r.getLong(0) - 100000L))
  }

  test("topk ngrams: counts are document frequency and deterministic") {
    val d = Seq(
      (1L, "a b c a b c"), // distinct grams: "a b c", "b c a", "c a b"
      (2L, "a b c"),
      (3L, "x y z")).toDF("doc_id", "text")
    val top = TextAnalysis.topkNgrams(d, "text", n = 3, k = 2).collect()
    assert(top(0).getString(0) == "a b c" && top(0).getLong(1) == 2)
    assert(top(1).getLong(1) == 1)
  }

  test("pii redaction replaces emails and long numbers, counts match") {
    val d = Seq(
      (1L, "mail me at jane.doe+x@example.org or call 5551234567 now"),
      (2L, "no pii here, just words and 123")).toDF("doc_id", "text")
    val r = TextAnalysis.withPiiRedaction(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getInt(1) == 1 && r(0).getInt(2) == 1)
    assert(r(0).getString(3) == "mail me at <EMAIL> or call <NUM> now")
    assert(r(1).getInt(1) == 0 && r(1).getInt(2) == 0)
    assert(r(1).getString(3) == "no pii here, just words and 123")
  }

  test("token stats are exact on known input") {
    val d = Seq((1L, "the quick brown fox the end")).toDF("doc_id", "text")
    val row = TextAnalysis.withTokenStats(d, "doc_id", "text").collect()(0)
    assert(row.getInt(1) == 6) // n_tokens
    assert(row.getInt(2) == 27) // len_chars
    assert(row.getInt(3) == 5) // distinct (the repeated)
  }

  test("language id recognizes scripts and stopword families") {
    val d = Seq(
      (1L, "привет мир это русский текст"),
      (2L, "这是 一段 中文 文本"),
      (3L, "the cat sat on the mat and it is fine"),
      (4L, "el perro y la casa de los amigos"),
      (5L, "der hund und die katze ist ein tier"),
      (6L, "le chien et le chat est une bête")).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("ru", "zh", "en", "es", "de", "fr"))
  }

  test("fingerprint is deterministic and content-sensitive") {
    val d = Seq((1L, "hello world"), (2L, "hello world"), (3L, "hello worlD")).toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprint(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("multimodal meta + stub decode are deterministic and schema-correct") {
    val meta = Multimodal.withBinaryMeta(docs.limit(20), "doc_id", "text")
    val m = meta.collect()
    assert(m.forall(r => r.getAs[Array[Byte]]("payload").length == r.getInt(r.fieldIndex("n_bytes"))))
    val dec = Multimodal.decodeStub(meta, "doc_id")
    assert(dec.schema == Multimodal.DecodedSchema)
    val d1 = dec.orderBy("doc_id").collect().toSeq
    val d2 = Multimodal.decodeStub(meta, "doc_id").orderBy("doc_id").collect().toSeq
    assert(d1 == d2)
    assert(d1.forall(r => r.getInt(1) >= 64 && r.getInt(1) < 576))
    assert(d1.forall(_.getSeq[Float](4).length == 8))
  }

  test("bmpDecode: exact pixel math on a hand-built padded bottom-up BMP") {
    // w=3 → raw row 9 bytes, stride pads to 12: decoder must skip padding.
    // Pixel (x,y)=top-down coords; R=10x+y makes every stat row-sensitive.
    val bytes = Multimodal.bmpEncode(3, 2, (x, y) => (10 * x + y, 7, x + 100 * y))
    val s = Multimodal.bmpDecode(bytes)
    assert(s.width == 3 && s.height == 2 && s.channels == 3)
    // R values: y=0: 0,10,20; y=1: 1,11,21 → sum 63
    assert(s.sumR == 63L, s.toString)
    assert(s.sumG == 7L * 6, s.toString)
    // B values: y=0: 0,1,2; y=1: 100,101,102 → 306
    assert(s.sumB == 306L, s.toString)
    // wsumR = 1*(0+10+20) + 2*(1+11+21) = 30 + 66 = 96; a decoder that
    // forgets the bottom-up flip would compute 1*33 + 2*30 = 93
    assert(s.wsumR == 96L, s.toString)
  }

  test("pngDecode: cross-validated against the JDK's independent ImageIO codec") {
    import graft.operators.Multimodal
    // 1. a PNG written by javax.imageio (its own encoder, its own filter
    //    heuristics, zlib settings, chunk layout) must decode to the exact
    //    pixel stats — proves the decoder handles real-world PNGs, not just
    //    our own encoder's output
    val w = 23; val h = 17
    def px(x: Int, y: Int): (Int, Int, Int) = ((5 * x + y) % 256, (x * y) % 256, (x + 9 * y) % 256)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val s = Multimodal.pngDecode(bos.toByteArray)
    val expR = (for (y <- 0 until h; x <- 0 until w) yield px(x, y)._1.toLong).sum
    val expW = (for (y <- 0 until h; x <- 0 until w) yield (y + 1).toLong * px(x, y)._1).sum
    assert(s.width == w && s.height == h && s.sumR == expR && s.wsumR == expW, s.toString)
    // 2. the reverse direction: OUR encoder's output (cycling all 5 filter
    //    types) read back by ImageIO gives identical pixels
    val mine = Multimodal.pngEncode(w, h, px)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(mine))
    assert(back.getWidth == w && back.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      assert((back.getRGB(x, y) & 0xffffff) == ((r << 16) | (g << 8) | b),
        s"pixel ($x,$y) diverges")
    }
    // 3. corrupted chunk CRC is refused loudly
    val broken = mine.clone()
    broken(broken.length - 5) = (broken(broken.length - 5) ^ 0x7f).toByte
    intercept[IllegalArgumentException](Multimodal.pngDecode(broken))
    intercept[IllegalArgumentException](Multimodal.pngDecode("junk".getBytes("UTF-8")))
  }

  test("bmpDecode: honors negative-height top-down storage and rejects junk") {
    val bottomUp = Multimodal.bmpEncode(4, 3, (x, y) => (x + 4 * y, 0, 0))
    val s1 = Multimodal.bmpDecode(bottomUp)
    // flip the height sign AND the row order: decode must be identical
    val topDown = bottomUp.clone()
    val stride = 12
    topDown(22) = (-3 & 0xff).toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    for (y <- 0 until 3; i <- 0 until stride)
      topDown(54 + y * stride + i) = bottomUp(54 + (2 - y) * stride + i)
    val s2 = Multimodal.bmpDecode(topDown)
    assert(s1 == s2, s"$s1 vs $s2")
    intercept[IllegalArgumentException] {
      Multimodal.bmpDecode("not an image".getBytes("UTF-8"))
    }
    val bad8bit = bottomUp.clone(); bad8bit(28) = 8
    intercept[IllegalArgumentException](Multimodal.bmpDecode(bad8bit))
  }

  test("hourlySpikes: signed surge/drop detection, never cold start or flat hours") {
    import graft.operators.Behavior
    // two independent series: one ends in a 10x surge, one in an outage
    // (separate types — a surge inside the trailing window would inflate
    // the variance and mask the drop, which is correct behavior)
    def series(tpe: String, lastN: Int): Seq[(java.sql.Timestamp, String)] =
      (0 until 12).flatMap { h =>
        val n = if (h == 11) lastN else 5 + (h % 2)
        (0 until n).map(_ => (java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:10:00"), tpe))
      }
    val df = (series("surge", 50) ++ series("drop", 1)).toDF("ts", "event_type")
    val r = Behavior.hourlySpikes(df, "ts", "event_type")
      .orderBy("event_type", "hour").collect()
    val (drop, surge) = r.splitAt(12)
    // cold start: first 6 hours of each series have m < 6 trailing hours
    assert((drop.take(6) ++ surge.take(6)).forall(_.getLong(4) == 0L))
    // steady hours never flag; the 10x hour flags +1, the outage hour -1
    assert((drop.slice(6, 11) ++ surge.slice(6, 11)).forall(_.getLong(4) == 0L),
      r.map(_.toSeq).mkString("\n"))
    assert(surge(11).getLong(2) == 50L && surge(11).getLong(4) == 1L, surge(11).toString)
    assert(drop(11).getLong(2) == 1L && drop(11).getLong(4) == -1L, drop(11).toString)
  }

  test("recallAtK: hand-built hit fractions, absent queries report zero") {
    import graft.operators.Eval
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("q", "item")
    val cand = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 55L))
      .toDF("q", "item")
    val r = Eval.recallAtK(truth, cand, "q", "item")
      .orderBy("query_id").collect()
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 2 && r(0).getDouble(3) == 2.0 / 3.0)
    assert(r(1).getLong(2) == 0 && r(1).getDouble(3) == 0.0)
    assert(r(2).getLong(2) == 0 && r(2).getDouble(3) == 0.0) // query absent from cand
  }

  test("kcenterSelect: hand-traced farthest-point rounds, non-increasing radius, id tie-break") {
    import graft.operators.Similarity
    // 1-dim points 0, .001, .01, .011, .1 -> quantized 0, 1e3, 1e4, 1.1e4, 1e5
    val pts = Seq((1L, Seq(0.0)), (2L, Seq(0.001)), (3L, Seq(0.01)),
      (4L, Seq(0.011)), (5L, Seq(0.1))).toDF("vec_id", "embedding")
    val out = Similarity.kcenterSelect(pts, "vec_id", "embedding", k = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // seed = min id; then farthest-first: 5 (1e10), 4 (1.21e8 vs its 89000^2
    // to center 5), then the 1e6 TIE between 2 and 3 resolves to id 2
    assert(out.toSeq == Seq((0L, 1L, 0L), (1L, 5L, 10000000000L),
      (2L, 4L, 121000000L), (3L, 2L, 1000000L)), out.mkString(", "))
    // radius curve non-increasing after the seed
    val d = out.drop(1).map(_._3)
    assert(d.zip(d.drop(1)).forall { case (a, b) => a >= b })
  }

  test("mrrAtK: first-hit rank drives rr, no-hit and absent queries report zero") {
    import graft.operators.Eval
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L)).toDF("q", "item")
    val cand = Seq((1L, 99L, 1L), (1L, 11L, 2L), (1L, 10L, 3L), // first hit at rank 2
      (2L, 55L, 1L), (2L, 56L, 2L)) // no hit
      .toDF("q", "item", "r")
    val m = Eval.mrrAtK(truth, cand, "q", "item", "r", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == ((2L, 500000L)))
    assert(m(2L) == ((0L, 0L)), "candidates with zero hits score 0")
    assert(m(3L) == ((0L, 0L)), "queries absent from candidate must not vanish")
  }

  test("ndcgAtK: perfect order scores 1e6, swaps lose, absent queries report zero") {
    import graft.operators.Eval
    val graded = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L), (2L, 20L, 1L))
      .toDF("q", "item", "g")
    def run(cand: Seq[(Long, Long, Long)]): Map[Long, Long] =
      Eval.ndcgAtK(graded, cand.toDF("q", "item", "r"), "q", "item", "g", "r", k = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // perfect grade-descending order => exactly 1e6
    val perfect = run(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (2L, 20L, 1L)))
    assert(perfect(1L) == 1000000L && perfect(2L) == 1000000L)
    // top-two swap loses exactly (dcg drops by (3-2)*(w1-w2))
    val swapped = run(Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 12L, 3L), (2L, 20L, 1L)))
    val idcg = 3L * 1000000L + 2L * 630929L + 1L * 500000L
    val dcgSwap = 2L * 1000000L + 3L * 630929L + 1L * 500000L
    assert(swapped(1L) == dcgSwap * 1000000L / idcg && swapped(1L) < 1000000L)
    // query 2 absent from candidate: present with ndcg 0, not dropped;
    // ungraded items contribute zero gain
    val partial = run(Seq((1L, 99L, 1L), (1L, 10L, 2L)))
    assert(partial(2L) == 0L)
    assert(partial(1L) == (3L * 630929L) * 1000000L / idcg)
  }

  test("kendallTau: +1 on agreement, -1 on reversal, ties contribute zero") {
    import graft.operators.Eval
    def tau(b: Seq[Double]): (Long, Long, Long, Double) = {
      val df = b.zipWithIndex.map { case (s, i) => (1L, i.toLong, (10 - i).toDouble, s) }
        .toDF("q", "item", "a", "b")
      val r = Eval.kendallTau(df, "q", "item", "a", "b").head()
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    assert(tau(Seq(4.0, 3.0, 2.0, 1.0)) == ((6L, 6L, 0L, 1.0))) // same order
    assert(tau(Seq(1.0, 2.0, 3.0, 4.0)) == ((6L, 0L, 6L, -1.0))) // reversed
    val (n, c, d, t) = tau(Seq(4.0, 3.0, 1.0, 2.0)) // one adjacent swap
    assert(n == 6 && c == 5 && d == 1 && t == 4.0 / 6.0)
    val (_, c2, d2, _) = tau(Seq(4.0, 4.0, 2.0, 1.0)) // tie: pair drops to 0
    assert(c2 == 5 && d2 == 0)
  }

  test("cdcChunks: shift resistance — a prefixed copy keeps most chunks intact") {
    def chunksOf(s: String): Seq[String] =
      spark.range(1).select(Kernels.cdcChunksCol(lit(s), 16, 64).as("c"))
        .head().getSeq[String](0)
    val base = Seq.tabulate(120)(i => s"w${i * 7919 % 997}").mkString(" ")
    val cb = chunksOf(base)
    assert(cb.size >= 4, s"fixture must produce several chunks, got ${cb.size}")
    assert(cb.mkString == base, "chunks must reassemble the document exactly")
    // a prefix edit shifts every byte; content-local boundaries mean all
    // chunks except the FIRST survive identically
    val cs = chunksOf("PREFIX EDIT " + base)
    assert(cs.toSet.intersect(cb.toSet).size >= cb.size - 1,
      s"CDC must keep shifted chunks: base=${cb.size} shared=${cs.toSet.intersect(cb.toSet).size}")
    // the fixed-window contrast: same shift, zero aligned 32-char slices
    val fixedB = base.grouped(32).toSeq
    val fixedS = ("PREFIX EDIT " + base).grouped(32).toSeq
    assert(fixedB.toSet.intersect(fixedS.toSet).size <= 1,
      "fixed windows lose alignment under the same edit")
  }

  test("valueMad: one wild outlier leaves the median/MAD unmoved") {
    import graft.operators.Behavior
    def mad(vals: Seq[Double]): (Long, Double) = {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
        .toDF("id", "event_type", "value")
      val r = Behavior.valueMad(df, "event_type", "value").head()
      (r.getLong(1), r.getDouble(2))
    }
    val base = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val (m1, d1) = mad(base)
    // replace the max with a 6-order-of-magnitude outlier: median and MAD
    // shift by at most one rank's worth (robustness), unlike mean/variance
    val (m2, d2) = mad(base.dropRight(1) :+ 9999999.0)
    assert(m1 == 800L && m2 == 800L, s"$m1 / $m2") // 2 * 400 cents
    assert(d1 == 400.0 && d2 == 400.0, s"$d1 / $d2") // 2 * 200 cents
  }

  test("invertedPostings: df counts past the cap, head stays capped and sorted") {
    import graft.operators.TextAnalysis
    val docs = (1L to 15L).map(i => (16L - i, "shared uniq" + (16 - i))).toDF("doc_id", "text")
    val r = TextAnalysis.invertedPostings(docs, "doc_id", "text", cap = 10)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getString(2))).toMap
    // "shared" is in all 15 docs: df = 15, head = the 10 SMALLEST ids sorted
    assert(r("shared") == ((15L, (1 to 10).mkString(","))), r("shared").toString)
    // a df-1 token lists exactly its one doc
    assert(r("uniq3") == ((1L, "3")), r("uniq3").toString)
  }

  test("winnowVerifiedPairs: identical candidate texts verify at distance zero") {
    import graft.operators.Dedup
    val body = "a sufficiently long shared passage that fingerprints identically"
    val docs = Seq((1L, body), (2L, body), (3L, body + " small tail change"))
      .toDF("doc_id", "text")
    val r = Dedup.winnowVerifiedPairs(docs, "doc_id", "text", minShared = 1L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r((1L, 2L)) == 0L, r.toString)
    assert(r.get((1L, 3L)).forall(_ > 0L), r.toString)
  }

  test("hashingTrick: order-invariant, occurrence-linear, vocabulary-free") {
    import graft.operators.Features
    def stats(text: String): (Long, Long, Long) = {
      val r = Features.hashingTrick(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
      (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // token ORDER cannot matter (bucket sums are commutative)
    assert(stats("alpha beta gamma delta") == stats("delta gamma beta alpha"))
    // a repeated token doubles its bucket value: same nonzeros, 2x L1, 4x dot
    val (n1, l1, d1) = stats("zeta")
    val (n2, l2, d2) = stats("zeta zeta")
    assert(n1 == 1L && n2 == 1L && l2 == 2 * l1 && d2 == 4 * d1)
    // L1 is bounded by the token count (collisions only cancel)
    val (_, l4, _) = stats("one two three four")
    assert(l4 <= 4)
  }

  test("kAnonymityViolations: exactly the under-k groups, nothing else") {
    import graft.operators.Features
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("en", "book"), ("de", "web"), ("de", "web"))
      .toDF("lang", "source")
    val r = Features.kAnonymityViolations(df, Seq("lang", "source"), k = 3L)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("en", "book") -> 1L, ("de", "web") -> 2L), r.toString)
  }

  test("winnowContainment: a planted quote scores 1.0 into its host, not back") {
    import graft.operators.Dedup
    val quote = "the very specific uncommon quoted passage text"
    val ctx = "surrounding host material that also appears elsewhere in corpus"
    val docs = Seq(
      (1L, quote),                    // the quote alone
      (2L, ctx + " " + quote),        // host embedding the quote
      (3L, ctx + " unrelated tail"),  // keeps host context at df >= 2
      (4L, "completely different filler content here"))
      .toDF("doc_id", "text")
    val r = Dedup.winnowContainment(docs, "doc_id", "text", minContainment = 0.0)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(4)).toMap
    // every banded fingerprint of the quote occurs in the host
    assert(r((1L, 2L)) == 1.0, r.toString)
    // the host holds banded fingerprints (shared with doc 3) the quote lacks
    assert(r((2L, 1L)) < 1.0, r.toString)
  }

  test("chi2Terms: perfect association tops the ranking, independence scores zero") {
    import graft.operators.TextAnalysis
    // 4 docs: "uniq" appears in ALL en docs and NO de docs (perfect
    // association); "both" appears in one doc of each lang (independence)
    val docs = Seq(
      (1L, "en", "uniq both filler"), (2L, "en", "uniq other words"),
      (3L, "de", "both anders hier"), (4L, "de", "noch mehr text"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.chi2Terms(docs, "doc_id", "lang", "text", topK = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    // perfect 2x2 association: a=2,b=0,c=0,d=2 -> chi2 = N = 4
    assert(r(("en", "uniq")) == 4.0, r.toString)
    // independent token: a=1,b=1,c=1,d=1 -> ad-bc = 0 -> chi2 = 0
    assert(r(("en", "both")) == 0.0 && r(("de", "both")) == 0.0, r.toString)
    // only observed (lang, token) pairs are candidates: "uniq" never occurs
    // in a de doc, so it is not a "de-distinctive term" row at all
    assert(!r.contains(("de", "uniq")), r.toString)
    // and the perfectly-associated token tops its language's ranking
    val top = TextAnalysis.chi2Terms(docs, "doc_id", "lang", "text", topK = 1)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(top("en") == "uniq", top.toString)
  }

  test("winnowFingerprints: match guarantee, density, edit robustness") {
    def fpsOf(s: String): Seq[Long] =
      spark.range(1).select(Kernels.winnowFingerprintsCol(lit(s), 8, 4).as("f"))
        .head().getSeq[Long](0)
    val shared = "UNCOMMON SHARED RUN OF TEXT" // 27 chars >> k + w - 1 = 11
    val a = "left context alpha " + shared + " tail one"
    val b = "other beginning material " + shared + " different end"
    // the winnowing guarantee: any common substring of length >= k + w - 1
    // forces at least one shared fingerprint
    assert(fpsOf(a).toSet.intersect(fpsOf(b).toSet).nonEmpty)
    // sorted distinct output, and density: one fp selected per window start
    // means at least (grams - w + 1) / w distinct values cannot hold in
    // general (duplicates collapse), but coverage can't be empty and the
    // list is strictly increasing
    val f = fpsOf(a)
    assert(f == f.distinct.sorted && f.nonEmpty)
    // prefix edit: fingerprints are content-local window minima, so a
    // shifted copy keeps most of them (the CDC argument at gram level)
    val base = Seq.tabulate(60)(i => s"w${i * 7919 % 997}").mkString(" ")
    val fb = fpsOf(base).toSet
    val fs = fpsOf("PREFIX EDIT " + base).toSet
    assert(fb.intersect(fs).size.toDouble >= fb.size * 0.8,
      s"shifted copy kept ${fb.intersect(fs).size}/${fb.size} fingerprints")
    // below one gram: nothing to fingerprint
    assert(fpsOf("short").isEmpty)
    // operator-level: the length filter drops sub-window docs entirely
    val docs = Seq((1L, "tiny"), (2L, "long enough text here")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text")
    assert(r.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("withIpv4Pii: octet validation, token anchoring, redaction") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "srv 10.0.0.1 up"), // valid
      (2L, "bad 256.1.1.1 addr"), // octet out of range
      (3L, "ver 1.2.3.4.5 tag"), // five groups: not a whole-token match
      (4L, "edge 255.255.255.255 and 0.0.0.0 both")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withIpv4Pii(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1 && r(0).getString(2) == "srv <IP> up")
    assert(r(1).getLong(1) == 0 && r(1).getString(2).contains("256.1.1.1"))
    assert(r(2).getLong(1) == 0)
    assert(r(3).getLong(1) == 2)
  }

  test("ngramNovelty: unique doc scores 1.0, duplicated docs score 0.0") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "alpha beta gamma delta"), // grams unique to doc 1
      (2L, "one two three four five"),
      (3L, "one two three four five") // exact dup of doc 2: df=2 everywhere
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2 && r(0).getDouble(3) == 1.0)
    assert(r(1).getDouble(3) == 0.0 && r(2).getDouble(3) == 0.0)
  }

  test("embeddingShift: zero on identical snapshots, exact on a hand case") {
    import graft.operators.Drift
    val base = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("embedding")
    val cur = Seq(Tuple1(Array(0.5f, 0.0f))).toDF("embedding")
    val r = Drift.embeddingShift(base, cur, "embedding").head()
    assert(r.getLong(0) == 2)
    assert(r.getLong(1) == 500000L * 500000L, r.toString)
    assert(r.getDouble(2) == 0.5)
    val same = Drift.embeddingShift(base, base, "embedding").head()
    assert(same.getLong(1) == 0L && same.getDouble(2) == 0.0)
  }

  test("mixedLanguage: interleaved bilingual doc flags mixed with the right majority") {
    import graft.operators.TextAnalysis
    val en = Seq.fill(8)("the cat is in the house and a dog").mkString(" ") // 64 en tokens
    val ru = Seq.fill(4)("привет мир это русский текст да нет слово").mkString(" ") // 32 ru tokens
    val df = Seq(
      (1L, en + " " + ru), // 2 en-majority chunks + ru tail chunks
      (2L, en) // monolingual
    ).toDF("doc_id", "text")
    val r = TextAnalysis.mixedLanguage(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) >= 2 && r(0).getLong(4) == 1L, r(0).toString) // n_langs, mixed
    assert(r(0).getString(3) == "en", "majority must be the dominant language")
    assert(r(1).getLong(2) == 1 && r(1).getLong(4) == 0L && r(1).getString(3) == "en")
  }

  test("withCardPii: Luhn classification on known numbers, length bounds respected") {
    val df = Seq(
      (1L, "pay 4532015112830366 now"), // known Luhn-valid 16-digit
      (2L, "fake 4532015112830367 here"), // off-by-one fails the checksum
      (3L, "short 123456789012 run"), // 12 digits: below card length
      (4L, "twentydigits 12345678901234567890 x"), // 20 digits: above
      (5L, "two 4532015112830366 and 79927398713 ok") // 16 valid + 11-digit ignored
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withCardPii(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1 && r(0).getLong(2) == 1)
    assert(r(1).getLong(1) == 1 && r(1).getLong(2) == 0)
    assert(r(2).getLong(1) == 0 && r(3).getLong(1) == 0)
    assert(r(4).getLong(1) == 1 && r(4).getLong(2) == 1)
  }

  test("kCoreRounds: pendant chain peels, clique survives, stable after convergence") {
    import graft.operators.Graph
    val clique = for { i <- 1 to 5; j <- (i + 1) to 5 } yield (i.toLong, j.toLong)
    val pendant = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val edges = (clique ++ pendant).toDF("src", "dst")
    def run(rounds: Int): Map[Long, Long] =
      Graph.kCoreRounds(edges, "src", "dst", k = 3, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = run(1)
    // the whole pendant path has degree < 3 and peels in one round; the K5
    // clique keeps internal degree 4
    assert(r1 == (1L to 5L).map(_ -> 4L).toMap, r1.toString)
    // extra rounds after convergence change nothing
    assert(run(4) == r1)
  }

  test("ksOf: exact hand-computed distance, zero on identical samples") {
    import graft.operators.Drift
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksOf(a, b, "v").head()
    // F1-F2 peaks at 0.5 between v=2 and v=4: d_num = 4*max|cum1-cum2| = 8
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getLong(2) == 8L && r.getDouble(3) == 0.5)
    val same = Drift.ksOf(a, a, "v").head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
  }

  test("charEntropy: zero for uniform runs, ln(k) for k distinct chars, quantized") {
    val df = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aab"), (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getDouble(3) == 0.0) // one symbol: no uncertainty
    assert(math.abs(r(1).getDouble(3) - math.log(4)) < 1e-5) // uniform over 4
    // H(2/3, 1/3) = ln(3) - (2 ln 2)/3, within quantization error
    assert(math.abs(r(2).getDouble(3) - (math.log(3) - 2 * math.log(2) / 3)) < 1e-5)
    assert(r(3).getLong(1) == 0 && r(3).getDouble(3) == 0.0)
  }

  test("bpeEncode kernel: merge order, left-to-right non-overlap, symbol bounds") {
    def enc(word: String, merges: Seq[String]): Long =
      spark.range(1).select(
        Kernels.bpeSegmentCountCol(lit(word), array(merges.map(lit(_)): _*)).as("n"))
        .head().getLong(0)
    assert(enc("abc", Seq("a b", "ab c")) == 1) // cascading merges compose
    assert(enc("abc", Seq("ab c", "a b")) == 2) // order matters: 'ab' not yet a symbol
    assert(enc("aaaa", Seq("a a")) == 2) // one pass, non-overlapping: [aa][aa]
    assert(enc("aaa", Seq("a a")) == 2) // [aa][a]
    assert(enc("aaaa", Seq("a a", "aa aa")) == 1)
    assert(enc("zxy", Seq("x y")) == 2) // [z][xy]: merges respect symbol bounds
    assert(enc("z", Seq("q q")) == 1)
  }

  test("gopher occupancy signals: exact fractions on hand-built texts") {
    val df = Seq(
      (1L, "a a a b"), // top word a x3 of 4; bigrams "a a" x2 of 3
      (2L, "x"), // single token: bigram count 0, frac 0
      (3L, "p q p q p") // p x3 of 5; "p q" x2 of 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 4 && r(0).getLong(2) == 3 && r(0).getLong(3) == 2)
    assert(r(0).getDouble(4) == 0.75 && r(0).getDouble(5) == 2.0 / 3.0)
    assert(r(1).getLong(2) == 1 && r(1).getLong(3) == 0 && r(1).getDouble(5) == 0.0)
    assert(r(2).getDouble(4) == 0.6 && r(2).getDouble(5) == 0.5)
    // kernel result equals the shuffle-based explode+groupBy formulation
    val kernel = TextAnalysis.gopherSignals(docs.limit(100), "doc_id", "text")
      .select($"doc_id", $"top_bigram_n")
    val exploded = docs.limit(100)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(split(trim(text), '\\\\s+')) - 1), " +
          "i -> concat(element_at(split(trim(text), '\\\\s+'), i), ' ', " +
          "element_at(split(trim(text), '\\\\s+'), i + 1)))")).as("gram"))
      .groupBy($"doc_id", $"gram").count()
      .groupBy($"doc_id").agg(max($"count").as("top_bigram_n"))
    assert(kernel.orderBy("doc_id").collect().toSeq ==
      exploded.orderBy("doc_id").collect().toSeq)
  }

  test("wavDecode: exact sample math, chunk walking, and loud rejects") {
    // hand-built stereo file: s(f, ch=0) = 10f - 5, s(f, ch=1) = -3f
    val samples = Array.tabulate(4 * 2) { i =>
      val f = i / 2
      (if (i % 2 == 0) 10 * f - 5 else -3 * f).toShort
    }
    val bytes = Multimodal.wavEncode(8000, 2, samples)
    val s = Multimodal.wavDecode(bytes)
    assert(s.channels == 2 && s.sampleRate == 8000 && s.nFrames == 4L)
    // ch0: -5, 5, 15, 25; ch1: 0, -3, -6, -9 → sumAbs 50 + 18
    assert(s.sumAbs == 68L, s.toString)
    assert(s.energy == (25L + 25 + 225 + 625) + (0L + 9 + 36 + 81), s.toString)
    // wsumC0 = 1*(-5) + 2*5 + 3*15 + 4*25 = 150; an interleave bug that
    // reads ch1 as ch0 would give 1*0 + 2*(-3) + 3*(-6) + 4*(-9) = -60
    assert(s.wsumC0 == 150L, s.toString)
    // a LIST chunk (odd size → word-aligned skip) before data must be walked
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val withChunk = bytes.slice(0, 36) ++ extra ++ bytes.slice(36, bytes.length)
    Multimodal.putLe32(withChunk, 4, withChunk.length - 8)
    assert(Multimodal.wavDecode(withChunk) == s, "chunk walking changed stats")
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode("not audio at all".getBytes("UTF-8"))
    }
    val bad8 = bytes.clone(); bad8(34) = 8 // bits-per-sample 8
    intercept[IllegalArgumentException](Multimodal.wavDecode(bad8))
    val alaw = bytes.clone(); alaw(20) = 6 // audio format A-law
    intercept[IllegalArgumentException](Multimodal.wavDecode(alaw))
  }

  test("bmpResample: identity within maxDim, exact nearest-neighbor mapping") {
    // image already within maxDim: resample is the identity, stats == decode
    val small = Multimodal.bmpEncode(4, 3, (x, y) => (10 * x + y, 7, x + 100 * y))
    val rs = Multimodal.bmpResample(small, 16)
    val dec = Multimodal.bmpDecode(small)
    assert(rs.outW == 4 && rs.outH == 3)
    assert(rs.sumR == dec.sumR && rs.sumG == dec.sumG &&
      rs.sumB == dec.sumB && rs.wsumR == dec.wsumR)
    // 4x4 -> 2x2 nearest-neighbor picks source pixels (0,0),(2,0),(0,2),(2,2)
    val img = Multimodal.bmpEncode(4, 4, (x, y) => (16 * y + x, 0, 0))
    val r2 = Multimodal.bmpResample(img, 2)
    assert(r2.outW == 2 && r2.outH == 2)
    assert(r2.sumR == 0 + 2 + 32 + 34, r2.toString)
    assert(r2.wsumR == 1 * (0 + 2) + 2 * (32 + 34), r2.toString)
  }

  test("kernel hash equals the interpreted Catalyst formulation") {
    val d = docs.limit(50).select($"doc_id", TextFns.tokens($"text").as("toks"))
    val kernel = d.select($"doc_id", Kernels.simhashCol($"toks").as("s"))
    val hof = d.select($"doc_id", TextFns.simhash($"toks", 32).as("s"))
    assert(kernel.orderBy("doc_id").collect().toSeq == hof.orderBy("doc_id").collect().toSeq)
    val grams = docs.limit(50).select($"doc_id", TextFns.wordNgrams($"text", 3).as("g"))
    val k2 = grams.select($"doc_id", Kernels.minhashSigCol($"g", 4).getItem(3).as("m"))
    val h2 = grams.select($"doc_id", TextFns.minhash($"g", 3).as("m"))
    assert(k2.orderBy("doc_id").collect().toSeq == h2.orderBy("doc_id").collect().toSeq)
  }

  test("quantized cosine is symmetric, 1.0 on self, in [-1,1]") {
    val sample = embs.limit(50)
    val self = sample.select(VectorFns.cosine($"embedding", $"embedding").as("c"))
    assert(self.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("hll: estimate within sketch error of truth; rollup bit-equal to direct") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val est = Sketches.hllDistinct(li, Seq("l_returnflag"), "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val tru = li.groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // m = 32 gives ~1.04/sqrt(32) ~ 18% standard error; accept 3 sigma
    tru.foreach { case (k, d) =>
      assert(math.abs(est(k) - d) / d < 0.55, s"$k: est ${est(k)} vs true $d") }
    // lossless rollup: merging per-(flag,status) registers == direct sketch
    val direct = Sketches.hllDistinct(li, Seq("l_returnflag"), "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    val rolled = Sketches.hllRollup(li, Seq("l_returnflag", "l_linestatus"),
      Seq("l_returnflag"), "l_partkey").orderBy("l_returnflag").collect().toSeq
    assert(direct == rolled)
  }

  test("hll: tiny cardinality takes the linear-counting branch and stays near-exact") {
    val tiny = (1 to 12).map(i => ("g", i)).toDF("g", "v")
    val r = Sketches.hllDistinct(tiny, Seq("g"), "v").collect().head
    val est = r.getDouble(3)
    assert(r.getLong(1) <= 12) // at most 12 filled buckets
    assert(est > 6 && est < 25, s"linear-counting estimate off: $est")
  }

  test("pagerank: mass conserved within truncation, hubs outrank leaves, deterministic") {
    // star + chain: hub 0 <-> {2,4,6,8}, plus 10 <-> 2 (symmetrized)
    val edges = Seq((0L, 2L), (2L, 0L), (0L, 4L), (4L, 0L), (0L, 6L), (6L, 0L),
      (0L, 8L), (8L, 0L), (10L, 2L), (2L, 10L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 6)
    // total mass ~ Scale, lost only to integer truncation
    val total = r.values.sum
    assert(total <= Graph.Scale && total > (Graph.Scale * 95) / 100, s"mass $total")
    // the degree-4 hub outranks every leaf; leaves {4,6,8} are symmetric
    assert(r(0L) > r(4L) && r(0L) > r(10L))
    assert(r(4L) == r(6L) && r(6L) == r(8L))
    val r2 = Graph.pagerank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == r2)
    // DIRECTED graph: a node with out-edges but no in-edges must keep its
    // base-rank row through every iteration, not vanish after the first
    val directed = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val d = Graph.pagerank(directed, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(d.keySet == Set(1L, 2L, 3L), d.toString)
    val base = (Graph.Scale * 15L / 100L) / 3L
    assert(d(3L) == base, s"no-inflow node should hold base rank: $d")
    assert(d(1L) > d(2L), "node 1 receives node 3's contribution too")
  }

  test("pagerank: plan depth bounded at 25 iterations, result checkpoint-placement independent") {
    val edges = Seq((0L, 2L), (2L, 0L), (0L, 4L), (4L, 0L), (0L, 6L), (6L, 0L),
      (0L, 8L), (8L, 0L), (10L, 2L), (2L, 10L)).toDF("src", "dst")
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val ck = Graph.pagerank(edges, "src", "dst", iters = 25, checkpointEvery = 5)
    val noCk = Graph.pagerank(edges, "src", "dst", iters = 25, checkpointEvery = 100)
    // checkpointed: plan holds at most checkpointEvery iterations above a
    // LogicalRDD leaf; unchecked: 25 chained join rounds
    assert(planNodes(ck) * 2 < planNodes(noCk),
      s"lineage not truncated: ck=${planNodes(ck)} noCk=${planNodes(noCk)}")
    val a = ck.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = noCk.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b, "checkpoint placement must not change the integer ranks")
  }

  test("triangles: exact counts, orientation-invariant, bipartite graphs have none") {
    // K4 minus one edge on {1,2,3,4}: triangles {1,2,3} and {1,2,4} only
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      // duplicates, reversed copies and self-loops must not change counts
      (3L, 2L), (2L, 2L)).toDF("src", "dst")
    val r = Graph.triangles(edges, "src", "dst")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), r.toString)
    // a bipartite graph (the customer-supplier shape) has zero triangles
    val bip = Seq((0L, 1L), (0L, 3L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangles(bip, "src", "dst").count() == 0)
  }

  test("personalized pagerank: non-seed-reachable mass is zero, seeds hold restart mass") {
    // two components: {1,2} (seeded) and {3,4} (unseeded)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.pagerankPersonalized(edges, "src", "dst", seeds, "node", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(3L) == 0L && r(4L) == 0L, s"unseeded component must hold zero mass: $r")
    assert(r(1L) > 0L && r(2L) > 0L)
    // the seed always holds at least its restart mass (0.15·Scale/|S|)
    assert(r(1L) >= Graph.Scale * 15L / 100L, r.toString)
    // all mass stays in the seeded component, lost only to truncation
    val total = r(1L) + r(2L)
    assert(total <= Graph.Scale && total > (Graph.Scale * 95) / 100, s"mass $total")
  }

  test("binByQuantiles: bins cover all rows, are ordered and roughly even") {
    val r = Features.binByQuantiles(docs, "n_chars", k = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_._2).sum == docs.count())
    // value ranges must not overlap across increasing bins
    r.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"bin ranges overlap: $lo vs $hi")
    }
    // equi-depth: no bin more than 2x the ideal share on this smooth fixture
    val ideal = docs.count() / 4.0
    r.foreach(b => assert(b._2 < ideal * 2, s"bin $b far from equi-depth"))
  }

  test("profile: counts and extremes match direct aggregation, nulls counted") {
    val df = Seq((1L, "a"), (2L, null), (3L, "c"), (3L, "a")).toDF("id", "s")
    val p = Features.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 3L, "1", "3")), p.toString)
    assert(p("s") == ((4L, 1L, 2L, "a", "c")), p.toString)
  }

  test("heavyHitters: randomized equivalence with plain group-by (collision-heavy sketches)") {
    // the operator's whole claim is EXACTNESS for any corpus/threshold —
    // width=2 forces pervasive CMS collisions, the verify pass must still
    // make the output identical to the direct aggregation
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "dd", "ee", "ff", "ggg")
    for (_ <- 1 to 3; width <- Seq(2, 64)) {
      val docs = (1 to 25).map(i => (i.toLong,
        Seq.fill(rnd.nextInt(8) + 1)(words(rnd.nextInt(words.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val t = rnd.nextInt(8) + 1
      val got = TextAnalysis.heavyHitters(docs, "text", t, depth = 2, width = width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = docs.select(explode(TextFns.tokens($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n")).filter($"n" >= t)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"t=$t width=$width: $got vs $exact")
    }
  }

  test("heavyHitters: exact output equals the plain group-by, sketch FPs filtered") {
    // tight sketch (width 2) forces collisions -> false-positive candidates
    // must be removed by the exact verify pass
    val docs = Seq((1L, "x x x y z"), (2L, "x y w"), (3L, "x v")).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "text", threshold = 2L, depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 5L, "y" -> 2L), got.toString)
  }

  test("randomProject: deterministic, linear, preserves the zero vector") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def proj(df: org.apache.spark.sql.DataFrame) =
      Embeddings.randomProject(df, "vec_id", "embedding", outDims = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p1 = proj(embs.limit(20))
    val p2 = proj(embs.limit(20))
    assert(p1 == p2 && p1.size == 20 * 8)
    // linearity of the sign matrix: doubling the input doubles the output
    // (2x on the 1e-6-quantized ints is exact)
    val doubled = embs.limit(20).select($"vec_id",
      transform($"embedding", x => x * 2.0f).as("embedding"))
    val pd = proj(doubled)
    // tolerance: floor(2v+0.5) vs 2*floor(v+0.5) differ by <=1 per dim,
    // 64 dims of ±1 weights
    p1.foreach { case (k, v) =>
      assert(math.abs(pd(k) - 2 * v) <= 64,
        s"projection not linear at $k: ${pd(k)} vs ${2 * v}")
    }
    val zero = Seq((0L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(proj(zero).values.forall(_ == 0L))
  }

  test("meanPool: truncating integer mean per (group, dim), negatives toward zero") {
    val embs = Seq(
      (0L, Array(1.0f, -1.0f)), (1L, Array(2.0f, -2.0f)), // group 0
      (10L, Array(5.0f, 0.5f))) // group 1, single member
      .toDF("vec_id", "embedding")
    val r = Embeddings.meanPool(embs, expr("vec_id div 10"), "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // (1e6 + 2e6) div 2 = 1_500_000; (-1e6 + -2e6) div 2 = -1_500_000
    assert(r((0L, 1L)) == 1500000L && r((0L, 2L)) == -1500000L, r.toString)
    assert(r((1L, 1L)) == 5000000L && r((1L, 2L)) == 500000L, r.toString)
  }

  test("valueOutliers: constructed spike flagged, uniform group silent") {
    val rows = (1L to 40L).map(i => (i, "a", 100.0)) ++
      Seq((41L, "a", 5000.0)) ++ // the spike
      (50L to 60L).map(i => (i, "b", 7.0)) // constant group: variance 0
    val df = rows.toDF("event_id", "event_type", "value")
    val r = Behavior.valueOutliers(df, "event_id", "event_type",
      floor(col("value") * 100 + lit(0.5)).cast("long"))
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r(41L) == 1L, s"spike must flag: $r")
    assert((1L to 40L).forall(r(_) == 0L), "bulk must stay silent")
    assert((50L to 60L).forall(r(_) == 0L), "zero-variance group must not flag its members")
  }

  test("bpeMerges: textbook low/lower/newest merges, ties break lexicographically") {
    val docs = Seq((1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(docs, "text", rounds = 3)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
      .sortBy(_._1)
    // round 1: "l o" and "o w" tie at 5; lexicographic tie-break picks "l o"
    assert(r(0) == ((1L, "l o", "lo", 5L)), r.mkString(";"))
    // round 2: the new symbol participates in the next pair ("lo w")
    assert(r(1) == ((2L, "lo w", "low", 5L)), r.mkString(";"))
    // round 3: "e r" and "low e" tie at 2; "e r" wins lexicographically
    assert(r(2) == ((3L, "e r", "er", 2L)), r.mkString(";"))
  }

  test("bpeMerges: pair counting is symbol-exact even when a symbol SUFFIX matches") {
    // corpus: "xy" repeated (chars x,y adjacent) plus "zx y"-shaped words.
    // The pair table must count ("x","y") from "x y" adjacency ONLY —
    // "z x" / "x y" inside "zxy"'s segments are their own pairs
    val docs = Seq((1L, "xy xy xy zxy zxy")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(docs, "text", rounds = 1)
      .collect().map(x => (x.getString(1), x.getLong(3)))
    // "x y" occurs in both words' segment strings: "x y" (from xy) and
    // "z x y" (from zxy) — symbol-level adjacency, count = 2 word types
    // weighted 3 + 2 = 5
    assert(r.head == (("x y", 5L)), r.mkString(";"))
  }

  test("bpeMerges: rewrite is symbol-aligned — a suffix collision cannot merge across a boundary") {
    // words: zx(3), zxy(1), xy(1). Round 1 merges ("z","x") → segments
    // "zx"(3) "zx y"(1) "x y"(1). Round 2 merges ("x","y") — applying it
    // to "zx y" must NOT produce "zxy" (the old string-level replace did):
    // the adjacency there is ("zx","y"), preserved for round 3.
    val docs = Seq((1L, "zx zx zx zxy xy")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(docs, "text", rounds = 3)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
      .sortBy(_._1)
    assert(r(0) == ((1L, "z x", "zx", 4L)), r.mkString(";"))
    assert(r(1) == ((2L, "x y", "xy", 1L)), r.mkString(";"))
    // present iff "zx y" survived round 2 un-crossed
    assert(r(2) == ((3L, "zx y", "zxy", 1L)), r.mkString(";"))
  }

  test("bpeMerges: in-memory and batched paths are bit-identical to sequential argmax") {
    // deterministic varied corpus (base-36 words off a Weyl sequence) so
    // batches of symbol-disjoint pairs actually form
    val words = (1 to 400).map(i =>
      java.lang.Long.toString((i * 2654435761L) % 100000000L, 36))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    // default: vocabulary fits the driver → incremental in-memory trainer
    val local = TextAnalysis.bpeMerges(docs, "text", rounds = 30)
      .collect().map(_.toSeq).toSeq
    val localCycles = TextAnalysis.lastBpeBatchRounds
    // beyond-driver fallback: distributed exact-batched loop
    val batched = TextAnalysis.bpeMerges(docs, "text", rounds = 30, localVocabLimit = 0L)
      .collect().map(_.toSeq).toSeq
    val batchedCycles = TextAnalysis.lastBpeBatchRounds
    // ground truth: one argmax merge per cycle
    val sequential = TextAnalysis.bpeMerges(docs, "text", rounds = 30, topK = 1,
      localVocabLimit = 0L).collect().map(_.toSeq).toSeq
    val sequentialCycles = TextAnalysis.lastBpeBatchRounds
    assert(local == sequential, s"local=$local\nsequential=$sequential")
    assert(batched == sequential, s"batched=$batched\nsequential=$sequential")
    assert(sequentialCycles == 30, s"topK=1 must degrade to one cycle per round: $sequentialCycles")
    assert(batchedCycles < 30,
      s"batched job count must be sublinear in rounds: $batchedCycles cycles for 30 merges")
    assert(localCycles == 1, s"in-memory path must cost O(1) jobs: $localCycles")
    // realistic merge-count scaling: 64+ merges stay O(1) Spark jobs on the
    // in-memory path (the production shape — a 32k vocabulary is the same
    // two jobs + driver CPU)
    val big = TextAnalysis.bpeMerges(docs, "text", rounds = 64).collect()
    assert(big.length == 64, s"expected 64 merges, got ${big.length}")
    assert(TextAnalysis.lastBpeBatchRounds == 1)
  }

  test("quality rules: one pass, exact violation counts, null handling per rule") {
    val df = Seq(
      (Some(1L), Some("en"), Some(10L)), (Some(2L), Some("xx"), Some(999L)),
      (Some(2L), None, None), (None, Some("de"), Some(-5L)))
      .toDF("id", "lang", "n")
    val r = Quality.check(df, Seq(
      Quality.notNull("id"), Quality.unique("id"),
      Quality.inRange("n", 0L, 100L), Quality.acceptedValues("lang", Seq("en", "de"))))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("not_null(id)") == ((1L, 0L)), r.toString)
    assert(r("unique(id)") == ((1L, 0L)), "one duplicate row beyond the first")
    // nulls are NOT range/membership violations (notNull owns them)
    assert(r("in_range(n,0,100)") == ((2L, 0L)), r.toString)
    assert(r("accepted_values(lang)") == ((1L, 0L)), r.toString)
    val clean = Quality.check(df.filter($"id" === 1L), Seq(Quality.notNull("id")))
      .head()
    assert(clean.getLong(1) == 0L && clean.getLong(2) == 1L)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe column compare") {
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("k", "v")
    val cur = Seq((1L, Some("a")), (2L, Some("B")), (3L, None: Option[String]),
      (5L, Some("e"))).toDF("k", "v")
    val r = Quality.snapshotDiff(base, cur, "k", Seq("v"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"), r.toString)
  }

  test("funnel: strict ordering honored, broken sequences keep their row") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)), // full
      (2L, "view", ts(0)), (2L, "click", ts(1)),                          // no purchase
      (3L, "click", ts(0)), (3L, "view", ts(1)),                          // click BEFORE view
      (4L, "purchase", ts(0)), (4L, "view", ts(1)), (4L, "click", ts(2)), // purchase too early
      (5L, "click", ts(0))                                                // never viewed
    ).toDF("user_id", "event_type", "ts")
    val f = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(f == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 2L)) // 5 absent: no view
    val s = Behavior.funnelSummary(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s == Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("windowed funnel: a stage past the conversion window does not count") {
    import java.sql.Timestamp
    def ts(h: Int) = new Timestamp(1700000000000L + h * 3600000L)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(2)),   // within 24h -> counts
      (2L, "view", ts(0)), (2L, "click", ts(30))   // 30h later -> outside
    ).toDF("user_id", "event_type", "ts")
    val f = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click"), maxGap = Some("24 HOURS"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(f == Map(1L -> 2L, 2L -> 1L), f.toString)
    // no window: both convert
    val g = Behavior.funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(g == Map(1L -> 2L, 2L -> 2L))
  }

  test("retention: cohort day = first event; offsets count distinct active days") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 10)), (1L, ts(1, 20)), (1L, ts(3, 5)), // cohort d1, offsets 0,2
      (2L, ts(2, 1)), (2L, ts(3, 1))                     // cohort d2, offsets 0,1
    ).toDF("user_id", "ts")
    val r = Behavior.retention(ev, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(("2024-01-01", 0L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("weighted sample: deterministic, k rows, heavy rows overrepresented") {
    val s1 = Sampling.weightedSample(docs, "doc_id", "n_chars", 50)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(docs, "doc_id", "n_chars", 50)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.size == 50)
    // pps pull: mean weight in the sample exceeds the corpus mean
    val sampleMean = docs.filter($"doc_id".isin(s1: _*))
      .agg(avg($"n_chars")).head().getDouble(0)
    val corpusMean = docs.agg(avg($"n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("weighted sample: null/zero/negative weights are excluded, not guaranteed-first") {
    // null priority would sort FIRST ascending — without the weight>=1
    // filter, the invalid rows would crowd out every valid one
    val rows = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long),
      (3L, java.lang.Long.valueOf(0L)), (4L, java.lang.Long.valueOf(-7L)),
      (5L, java.lang.Long.valueOf(3L))).toDF("id", "w")
    val got = Sampling.weightedSample(rows, "id", "w", 3)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L), s"only valid-weight rows may be sampled: $got")
  }

  test("lmFitScore: frequent-token docs score lower than rare-token docs") {
    val corpus = Seq(
      (1L, "the the the the the the the the"),
      (2L, "the cat sat on the mat"),
      (3L, "zyzzyva qoph")).toDF("doc_id", "text")
    val r = TextAnalysis.lmFitScore(corpus, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L), r.toString)
    // avg_nll is an average of per-token bits: non-negative, finite
    assert(r.values.forall(v => v >= 0 && !v.isNaN && !v.isInfinite))
  }

  test("rollingDaily: range frame counts gap days correctly") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // days 1, 2, 9: the 7-day window at day 9 must NOT reach days 1-2
    val ev = Seq((1L, ts(1), 100L), (1L, ts(2), 100L), (1L, ts(9), 100L))
      .toDF("user_id", "ts", "cents")
    val r = Behavior.rollingDaily(ev, "user_id", "ts", $"cents", 7)
      .orderBy("day").collect()
    assert(r.map(_.getLong(4)).toSeq == Seq(1L, 2L, 1L)) // n_events_window
    assert(r.map(_.getLong(5)).toSeq == Seq(100L, 200L, 100L))
  }

  test("mergeUpsert: deletes removed, updates applied, inserts appended") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq((2L, "B", "upsert"), (3L, "c", "delete"), (4L, "d", "upsert"))
      .toDF("id", "v", "op")
    val r = Upsert.mergeUpsert(base, changes, "id")
      .orderBy("id").collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(r == Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("touchedFiles: copy-on-write rewrite set is bounded by zone intersection") {
    val tmp = java.nio.file.Files.createTempDirectory("cowzone").toString
    Layout.compact(docs, tmp, "doc_id", 50L)
    val zm = Layout.buildZoneMap(spark, tmp, "doc_id")
    val changes = Seq(3L, 7L, 451L).toDF("doc_id")
    val touched = Upsert.touchedFiles(zm, changes, "doc_id")
    val (t, total) = (touched.count(), zm.count())
    assert(t < total, s"rewrite set $t not smaller than table $total")
    // every change key is covered by some touched file
    val ranges = touched.collect().map(r =>
      (r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))
    assert(Seq(3L, 7L, 451L).forall(k => ranges.exists { case (lo, hi) => k >= lo && k <= hi }))
  }

  test("kmeansRefine: deterministic, twins co-assigned, refinement non-trivial") {
    val twin = embs.filter($"vec_id" === 7)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
    val d = embs.select($"vec_id", $"embedding", $"label").union(twin)
    val r1 = Similarity.kmeansRefine(d, "vec_id", "embedding")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val r2 = Similarity.kmeansRefine(d, "vec_id", "embedding")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r1 == r2 && r1.size == d.count())
    assert(r1(7L) == r1(100007L)) // identical vectors: same init and refined cell
    // Lloyd moved something (data-dependent centroids differ from seeding)
    assert(r1.exists { case (_, (i, f)) => i != f })
  }

  test("kmvOverlap: exact under k, estimator within sketch error above k") {
    // tiny sets -> exact path: A={1..10}, B={6..15}: union 15, inter 5
    val a = (1 to 10).toDF("v"); val b = (6 to 15).toDF("v")
    val ex = Sketches.kmvOverlap(a, b, "v", 64).head()
    assert(ex.getLong(0) == 15L && ex.getLong(1) == 5L)
    assert(ex.getDouble(2) == 15.0 && ex.getDouble(3) == 5.0)
    assert(math.abs(ex.getDouble(4) - 5.0 / 15.0) < 1e-12)
    // big sets -> estimator: en/de vocab overlap vs exact figures
    def toks(lang: String) = docs.filter($"lang" === lang)
      .select(explode(graft.functions.TextFns.tokens($"text")).as("w"))
    val est = Sketches.kmvOverlap(toks("en"), toks("de"), "w", 64).head()
    val ta = toks("en").distinct().collect().map(_.getString(0)).toSet
    val tb = toks("de").distinct().collect().map(_.getString(0)).toSet
    val (tu, ti) = ((ta ++ tb).size, (ta & tb).size)
    assert(math.abs(est.getDouble(2) - tu) / tu < 0.5,
      s"union est ${est.getDouble(2)} vs true $tu")
    // intersection is small; allow union-scaled absolute error (k=64 sketch)
    assert(math.abs(est.getDouble(3) - ti) < 0.25 * tu,
      s"inter est ${est.getDouble(3)} vs true $ti")
  }

  test("transition matrix: lag pairs per user, probabilities sum to 1 per from-state") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      (1L, 10L, "A", ts(0)), (1L, 11L, "B", ts(1)), (1L, 12L, "A", ts(2)),
      (2L, 20L, "A", ts(0)), (2L, 21L, "C", ts(1)),
      (3L, 30L, "Z", ts(5))). // single event: no transition
      toDF("user_id", "event_id", "event_type", "ts")
    val r = Behavior.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(4))).toMap
    assert(r.keySet == Set(("A", "B"), ("A", "C"), ("B", "A")))
    assert(r(("A", "B")) == ((1L, 0.5)) && r(("A", "C")) == ((1L, 0.5)))
    assert(r(("B", "A")) == ((1L, 1.0)))
    // duplicate-timestamp determinism: tie broken by event_id
    val dup = Seq((1L, 1L, "X", ts(0)), (1L, 2L, "Y", ts(0)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val d = Behavior.transitionMatrix(dup, "user_id", "event_type", "ts", "event_id")
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(d == Seq(("X", "Y")))
  }

  test("topPaths: triples stay inside one user's stream and count exactly") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      (1L, 1L, "A", ts(0)), (1L, 2L, "B", ts(1)), (1L, 3L, "C", ts(2)), (1L, 4L, "B", ts(3)),
      (2L, 5L, "A", ts(0)), (2L, 6L, "B", ts(1)), (2L, 7L, "C", ts(2))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val r = Behavior.topPaths(ev, "user_id", "event_type", "ts", "event_id", 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2)) -> x.getLong(3)).toMap
    // A>B>C twice (both users), B>C>B once (user 1 only); user boundary not crossed
    assert(r == Map(("A", "B", "C") -> 2L, ("B", "C", "B") -> 1L), r.toString)
  }

  test("psiByGroup: zero for unchanged groups, vanished group stays present") {
    val base = Seq(("en", 10L), ("en", 60L), ("de", 10L), ("de", 60L)).toDF("lang", "v")
    val cur = Seq(("en", 10L), ("en", 60L)).toDF("lang", "v") // de vanished
    val r = Drift.psiByGroup(base, cur, "lang", "v", 50L, 4)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getDouble(4))).toMap
    assert(r.keySet == Set("en", "de"))
    assert(r("en")._2 == 0.0, s"unchanged group must read 0: $r")
    assert(r("de")._1 == 0L && r("de")._2 > 0.0, s"vanished group must be loud: $r")
  }

  test("basket co-occurrence: pair counts dedup within basket, lift above chance") {
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "B"), // B twice in basket 1: one co-occurrence
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "C")).toDF("basket", "item")
    val r = Basket.coOccurrence(rows, "basket", "item", minSupport = 1L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(5))).toMap
    // n_ab(A,B) = 2 despite B's duplicate; lift = 4*2/(3*2) = 1.333...
    assert(r(("A", "B"))._1 == 2L)
    assert(math.abs(r(("A", "B"))._2 - 4.0 * 2 / 3 / 2) < 1e-12)
    // A-C co-occur once by chance: lift = 4*1/(3*2) = 0.666...
    assert(math.abs(r(("A", "C"))._2 - 4.0 * 1 / 3 / 2) < 1e-12)
    // minSupport prunes: with threshold 2 only (A,B) survives
    val pruned = Basket.coOccurrence(rows, "basket", "item", minSupport = 2L)
    assert(pruned.count() == 1L)
  }

  test("banded co-occurrence: stopwords excluded BEFORE the self-join, pairs vocab-bounded") {
    // 40 docs; 'stop' in all 40 (df 100%), 'mid1'/'mid2' co-occur in 20,
    // 'rare' in 1. Band [minDf=5, 900‰ → df<=36]: only mid1/mid2 survive.
    val rows = (1L to 40L).flatMap { d =>
      Seq((d, "stop")) ++
        (if (d <= 20) Seq((d, "mid1"), (d, "mid2")) else Nil) ++
        (if (d == 7) Seq((d, "rare")) else Nil)
    }.toDF("basket", "item")
    val r = Basket.coOccurrenceBanded(rows, "basket", "item",
      minSupport = 1L, minDf = 5L, maxDfPerMille = 900L).collect()
    val items = r.flatMap(x => Seq(x.getString(0), x.getString(1))).toSet
    assert(!items.contains("stop"), s"stopword must not reach the pair join: $items")
    assert(!items.contains("rare"), s"sub-minDf item must be pruned: $items")
    // banded vocabulary has 2 items → at most C(2,2)=1 pair, exactly (mid1,mid2)
    assert(r.length == 1 && r.head.getString(0) == "mid1" && r.head.getString(1) == "mid2")
    assert(r.head.getLong(2) == 20L && r.head.getLong(3) == 20L)
    // lift n stays the FULL basket count (40), not the banded one
    assert(math.abs(r.head.getDouble(5) - 40.0 * 20 / 20 / 20) < 1e-12)
  }

  test("psi: million-row snapshots stay in 64-bit range (no silent overflow)") {
    // 90/10 vs 10/90 mix at 2M rows/side: PSI = 1.6·ln(9) ≈ 3.5155. The
    // pre-fix exact-numerator algebra produced pq_num·qln ≈ 7e21 here,
    // wrapping Long and flipping signs exactly when drift is large.
    val counts = Seq((0L, 1800000L, 200000L), (1L, 200000L, 1800000L))
      .toDF("bucket", "n_base", "n_cur")
    val r = Drift.psi(counts, 2).head()
    val expected = 1.6 * math.log(9.0)
    assert(r.getLong(0) == 2000000L && r.getLong(1) == 2000000L)
    assert(math.abs(r.getDouble(3) - expected) < 1e-3,
      s"psi ${r.getDouble(3)} vs expected $expected")
    // per-term bound: |qpq| <= 1e6+1, so even a 10^12-row snapshot cannot
    // push |psi_scaled| past ~2e6 * max|qln| << 2^63
    assert(math.abs(r.getLong(2)) < 4e15.toLong, s"psi_scaled ${r.getLong(2)}")
  }

  test("psi: zero on identical snapshots, positive and larger under stronger shift") {
    val self = Drift.psiOf(docs, docs, "n_chars", 50L, 12).head()
    assert(self.getLong(2) == 0L && self.getDouble(3) == 0.0)
    val mild = Drift.psiOf(docs, docs.filter($"doc_id" % 3 === 0), "n_chars", 50L, 12)
      .head().getDouble(3)
    val strong = Drift.psiOf(docs, docs.filter($"n_chars" >= 200), "n_chars", 50L, 12)
      .head().getDouble(3)
    // unbiased 1/3 subsample barely moves the mix; a hard length cut shifts it
    assert(mild >= 0 && mild < 0.05, s"mild drift $mild")
    assert(strong > mild && strong > 0.1, s"strong drift $strong")
    // negative values clamp into bucket 0 instead of silently vanishing
    val neg = Seq(-100L, -1L, 5L, 60L).toDF("v")
    val nb = Drift.psiBuckets(neg, neg, "v", 50L, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nb(0L) == ((3L, 3L)) && nb(1L) == ((1L, 1L)), nb.toString)
    assert(nb.values.map(_._1).sum == 4L, "all rows must be counted")
  }

  test("decayedValue: half-life halves the weight, older events count less") {
    val w = Behavior.decayWeights(7.0, 21)
    assert(w(0) == 1000000000L && w(7) == 500000000L && w(14) == 250000000L)
    assert(w.sliding(2).forall(p => p(1) < p(0)))
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // same cents on the last day vs 7 days earlier: exactly 2x the score
    val ev = Seq((1L, ts(8), 100.0), (2L, ts(1), 100.0)).toDF("user_id", "ts", "value")
    val r = Behavior.decayedValue(ev, "user_id", "ts",
      floor($"value" * 100 + lit(0.5)).cast("long"), 7.0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 2 * r(2L), r.toString)
  }

  test("bloom skipping: equality probe opens few files, exact rows, no false negatives") {
    val tmp = java.nio.file.Files.createTempDirectory("bloomidx").toString
    Layout.compact(docs, tmp, "source", 50L)
    val idx = Layout.buildBloomIndex(spark, tmp, "source")
    val (pruned, kept, total) = Layout.bloomSkippingRead(spark, tmp, idx, "source", "src7")
    assert(total >= 5, s"expected several files, got $total")
    assert(kept < total, s"no pruning: kept $kept of $total")
    val expect = docs.filter($"source" === "src7").orderBy("doc_id").collect().toSeq
    assert(pruned.orderBy("doc_id").collect().toSeq == expect)
    // a value absent from the table returns no rows regardless of bloom FPs
    val (none, _, _) = Layout.bloomSkippingRead(spark, tmp, idx, "source", "no_such_source")
    assert(none.count() == 0)
  }

  test("zone-map skipping prunes files and returns exactly the filtered rows") {
    val tmp = java.nio.file.Files.createTempDirectory("zonemap").toString
    Layout.compact(docs, tmp, "doc_id", 20L)
    val zm = Layout.buildZoneMap(spark, tmp, "doc_id")
    val (pruned, kept, total) = Layout.skippingRead(spark, tmp, zm, "doc_id", 40L, 80L)
    assert(total >= 5, s"expected several files, got $total")
    assert(kept < total, s"no pruning: kept $kept of $total")
    val expect = docs.filter($"doc_id" >= 40 && $"doc_id" <= 80)
      .orderBy("doc_id").collect().toSeq
    assert(pruned.orderBy("doc_id").collect().toSeq == expect)
    // empty-intersection range reads zero files
    val (none, kept0, _) = Layout.skippingRead(spark, tmp, zm, "doc_id", -100L, -50L)
    assert(kept0 == 0 && none.count() == 0)
    // the distributed-manifest variant prunes to the SAME file set and rows
    val (prunedD, keptD, totalD) = Layout.skippingReadDistributed(
      spark, tmp, zm, "doc_id", 40L, 80L)
    assert(keptD == kept.toLong && totalD == total.toLong,
      s"distributed prune diverged: ($keptD,$totalD) vs ($kept,$total)")
    assert(prunedD.orderBy("doc_id").collect().toSeq == expect)
    val (noneD, keptD0, _) = Layout.skippingReadDistributed(
      spark, tmp, zm, "doc_id", -100L, -50L)
    assert(keptD0 == 0L && noneD.count() == 0)
  }

  test("linkPredict: path predicts endpoints, triangle predicts nothing, hub cap prunes") {
    // path 1-2-3: the only non-adjacent pair sharing a neighbor is (1,3)
    // through w=2 with deg(2)=2 → aa = 1e12 div floor(ln(2)*1e6 + 0.5)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.linkPredict(path, "src", "dst").collect()
    assert(p.length == 1)
    assert(p(0).getLong(0) == 1L && p(0).getLong(1) == 3L && p(0).getLong(2) == 1L)
    assert(p(0).getLong(3) == 1000000000000L / math.floor(math.log(2.0) * 1e6 + 0.5).toLong)
    // a triangle is fully adjacent — no candidate pairs at all
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.linkPredict(tri, "src", "dst").count() == 0)
    // star 0-{1..5}: all pairs predicted through the hub; capping the
    // intermediate degree below 5 removes the hub and with it every wedge
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graph.linkPredict(star, "src", "dst").count() == 10)
    assert(Graph.linkPredict(star, "src", "dst", maxDeg = 4L).count() == 0)
    // two shared neighbors accumulate: square 1-2-3-4-1 predicts both
    // diagonals with cn=2 and twice the single-neighbor aa term
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val d = Graph.linkPredict(sq, "src", "dst").orderBy("node_a").collect()
    assert(d.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 2L), (2L, 4L, 2L)))
    assert(d(0).getLong(3) == 2L * (1000000000000L / math.floor(math.log(2.0) * 1e6 + 0.5).toLong))
  }

  test("rfm: metrics exact on a hand log, segment encodes the three scores") {
    // 3 users against anchor = newest event: u1 recent+frequent+big,
    // u2 middling, u3 stale+rare+small — tertiles split them 1/2/3 cleanly
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 00:00:00")
    val ev = Seq(
      (1L, ts(30), 100.0), (1L, ts(29), 100.0), (1L, ts(28), 100.0),
      (2L, ts(20), 10.0), (2L, ts(19), 10.0),
      (3L, ts(10), 1.0)
    ).toDF("user_id", "ts", "value")
    val r = Behavior.rfm(ev, "user_id", "ts", "value")
      .orderBy("user_id").collect()
    // recency: u1 0d, u2 10d, u3 20d; frequency 3/2/1; monetary 30000/2000/100
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ==
      Seq((1L, 0L, 3L, 30000L), (2L, 10L, 2L, 2000L), (3L, 20L, 1L, 100L)))
    assert(r.map(_.getAs[Long]("segment")).toSeq == Seq(333L, 222L, 111L))
  }

  test("wavResample: identity at/above source rate, exact half-rate decimation") {
    // stereo, 6 frames at 8 kHz; ch0 = 10,20,..,60, ch1 = negatives
    val samples = Array[Short](10, -1, 20, -2, 30, -3, 40, -4, 50, -5, 60, -6)
    val wav = Multimodal.wavEncode(8000, 2, samples)
    // target >= source: outFrames == srcFrames and the stats equal decode's
    val id = Multimodal.wavResample(wav, 8000)
    val dec = Multimodal.wavDecode(wav)
    assert(id.outRate == 8000 && id.outFrames == dec.nFrames)
    assert(id.sumAbs == dec.sumAbs && id.energy == dec.energy && id.wsumC0 == dec.wsumC0)
    // half rate: out frame i reads source frame i*6 div 3 = 0,2,4 — both
    // channels of each kept frame, weights over OUTPUT indices
    val half = Multimodal.wavResample(wav, 4000)
    assert(half.outRate == 4000 && half.outFrames == 3)
    assert(half.sumAbs == (10 + 1 + 30 + 3 + 50 + 5))
    assert(half.energy == (100 + 1 + 900 + 9 + 2500 + 25))
    assert(half.wsumC0 == 1 * 10 + 2 * 30 + 3 * 50)
  }

  test("powerSums: shard merge equals direct; targetEncode singleton decays to the prior") {
    val df = docs.select($"lang", $"n_chars")
    val direct = Features.powerSums(df, "lang", "n_chars")
      .orderBy("lang").collect()
    // power sums are component-wise addable: recompute from two hash shards
    val a = Features.powerSums(df.filter(abs(hash($"n_chars")) % 2 === 0), "lang", "n_chars")
    val b = Features.powerSums(df.filter(abs(hash($"n_chars")) % 2 === 1), "lang", "n_chars")
    val merged = a.select($"lang", $"n", $"s1", $"s2", $"s3", $"s4")
      .unionByName(b.select($"lang", $"n", $"s1", $"s2", $"s3", $"s4"))
      .groupBy($"lang")
      .agg(sum($"n").as("n"), sum($"s1").as("s1"), sum($"s2").as("s2"),
        sum($"s3").as("s3"), sum($"s4").as("s4"))
      .withColumn("mean_micro", expr("s1 * 1000000 div n"))
      .withColumn("var_num", $"n" * $"s2" - $"s1" * $"s1")
      .orderBy("lang").collect()
    assert(direct.toSeq == merged.toSeq)

    // target encoding: category A mean shrinks toward the prior; LOO of a
    // singleton category IS the prior exactly
    val t = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "B", 300L))
      .toDF("id", "cat", "cents")
    val e = Features.targetEncode(t, "id", "cat", $"cents", smoothing = 1L)
      .orderBy("id").collect()
    val gmean = 600L * 1000000L / 3L
    assert(e(0).getAs[Long]("enc_micro") == (300L * 1000000L + gmean) / 3L)
    // LOO for id=1 (y=100): remaining A obs is 200, prior 200 -> exactly 200
    assert(e(0).getAs[Long]("enc_loo_micro") == 200L * 1000000L)
    // singleton B: LOO denominator is m alone -> the prior
    assert(e(2).getAs[Long]("enc_loo_micro") == gmean)
  }

  test("labelPropagation: triangles converge to min label, disjoint components stay apart") {
    val tri2 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val l = Graph.labelPropagation(tri2, "src", "dst", rounds = 2)
      .orderBy("node").collect()
    assert(l.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (12L, 10L)))
    // deterministic: a rerun is bit-identical
    val l2 = Graph.labelPropagation(tri2, "src", "dst", rounds = 2)
      .orderBy("node").collect()
    assert(l.toSeq == l2.toSeq)
  }

  test("lengthBucketedBatches: per-batch spread bounded by bucket width, exact waste") {
    val docs = ((1L to 10L).map(i => (i, Seq.fill(3)("w").mkString(" "))) ++
      Seq((11L, Seq.fill(20)("w").mkString(" ")), (12L, Seq.fill(21)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val r = Batching.lengthBucketedBatches(docs, "doc_id", "text", 16L, 4L, seed = 7L)
      .orderBy("bucket", "batch_idx").collect()
    // bucket 0: ten 3-token docs -> batches of 4/4/2, zero padding waste
    val b0 = r.filter(_.getAs[Long]("bucket") == 0L)
    assert(b0.map(_.getAs[Long]("n_docs")).sorted.toSeq == Seq(2L, 4L, 4L))
    assert(b0.forall(_.getAs[Long]("padding_waste") == 0L))
    // bucket 1: the 20- and 21-token docs batch together, waste = 21*2-41
    val b1 = r.filter(_.getAs[Long]("bucket") == 1L)
    assert(b1.length == 1 && b1.head.getAs[Long]("padding_waste") == 1L)
    // the bucketing invariant: in-batch spread < bucket width
    assert(r.forall(x => x.getAs[Long]("max_tokens") - x.getAs[Long]("min_tokens") < 16L))
  }

  test("interArrival: a timer-driven client is metronomic, a human is not") {
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val evs = ((0L to 4L).map(i => (1L, ts(i * 60))) ++ // exact 60 s timer
      Seq(2L -> ts(0), 2L -> ts(10), 2L -> ts(110), 2L -> ts(1110), 2L -> ts(1160)))
      .map { case (u, t0) => (u, t0) }.toDF("user_id", "ts")
    val r = Behavior.interArrival(evs, "user_id", "ts").orderBy("user_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("median_gap_x2") == 120000000L
      && r(0).getAs[Double]("mad_x2") == 0.0
      && r(0).getAs[Long]("is_metronomic") == 1L)
    assert(r(1).getAs[Long]("is_metronomic") == 0L
      && r(1).getAs[Long]("min_gap_us") == 10000000L
      && r(1).getAs[Long]("max_gap_us") == 1000000000L)
  }

  test("hardNegatives: same-label vectors never surface, rank follows cosine") {
    val vs = Seq(
      (1L, Seq(1e-3f, 0f), 0), (2L, Seq(1e-3f, 1e-5f), 1),
      (3L, Seq(0f, 1e-3f), 1), (4L, Seq(0.99e-3f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(vs, vs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", "label", 3).orderBy("rank").collect()
    // only the two label-1 vectors qualify; near-parallel v2 outranks v3
    assert(r.map(_.getAs[Long]("negative_id")).toSeq == Seq(2L, 3L))
    assert(r.forall(_.getAs[Long]("neg_label") == 1L))
  }

  test("cohortLtv: hand cumulative curve, per-user micro-cents") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 08:00:00")
    val evs = Seq(
      (1L, ts(0), "view", 0.0), (1L, ts(0), "purchase", 1.0),
      (2L, ts(0), "view", 0.0), (2L, ts(1), "purchase", 2.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = Behavior.cohortLtv(evs, "user_id", "ts", "value", "event_type", "purchase")
      .orderBy("age_days").collect()
      .map(x => (x.getAs[Long]("age_days"), x.getAs[Long]("cohort_size"),
        x.getAs[Long]("rev_cents"), x.getAs[Long]("cum_rev_cents"), x.getAs[Long]("ltv_micro")))
    assert(r.toSeq == Seq(
      (0L, 2L, 100L, 100L, 50000000L),
      (1L, 2L, 200L, 300L, 150000000L)))
  }

  test("woeEncode: symmetric hand case, zero-event category stays finite") {
    val rows = Seq.fill(3)(("hi", "F")) ++ Seq(("hi", "O")) ++
      Seq(("lo", "F")) ++ Seq.fill(3)(("lo", "O"))
    val df = rows.toDF("cat", "status")
    val r = Features.woeEncode(df, "cat", col("status") === "F")
      .orderBy("category").collect()
    // G=4,B=4,K=2: woe(hi) = qln4 - qln2 = ln(2)*1e6; lo is its mirror
    assert(r(0).getAs[Long]("woe_scaled") == 693147L)
    assert(r(1).getAs[Long]("woe_scaled") == -693147L)
    assert(r(0).getAs[Long]("dist_g_micro") == 666666L
      && r(0).getAs[Long]("dist_b_micro") == 333333L)
    assert(r(0).getAs[Long]("iv_contrib") == 333333L * 693147L)
    // a category with zero events: Laplace smoothing keeps WoE finite
    val z = Seq(("a", "F"), ("b", "O"), ("b", "O")).toDF("cat", "status")
    val rz = Features.woeEncode(z, "cat", col("status") === "F").collect()
    assert(rz.forall(x => math.abs(x.getAs[Long]("woe_scaled")) < 10000000L))
    // NULL targets are excluded from BOTH cells, not counted as non-events
    val withNulls = (rows ++ Seq(("hi", null), ("lo", null)))
      .toDF("cat", "status")
    val rn = Features.woeEncode(withNulls, "cat", col("status") === "F")
      .orderBy("category").collect()
    assert(rn(0).getAs[Long]("g") == 3L && rn(0).getAs[Long]("b") == 1L)
  }

  test("quantizeScalar: per-dim calibration, truncating recon, constant dim exact") {
    val vs = Seq((1L, Seq(0e-6f, 10e-6f)), (2L, Seq(100e-6f, 10e-6f)),
      (3L, Seq(37e-6f, 10e-6f))).toDF("vec_id", "embedding")
    val r = Embeddings.quantizeScalar(vs, "vec_id", "embedding")
      .orderBy("vec_id", "dim").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("dim"), x.getAs[Long]("code"), x.getAs[Long]("err")))
    // dim 1 range [0,100]: 37 -> code 94, recon 36, err 1; endpoints exact
    // dim 2 constant: code 0, recon = min, err 0
    assert(r.toSeq == Seq(
      (1L, 1L, 0L, 0L), (1L, 2L, 0L, 0L),
      (2L, 1L, 255L, 0L), (2L, 2L, 0L, 0L),
      (3L, 1L, 94L, 1L), (3L, 2L, 0L, 0L)))
  }

  test("abTest: cells match a driver-side md5 replay, degenerate margins yield NULL chi2") {
    def variantOf(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if ("%02x".format(d(0)).charAt(0) < '8') "A" else "B"
    }
    val evs = (1L to 20L).flatMap { u =>
      Seq((u, "view")) ++ (if (u % 2 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val r = Behavior.abTest(evs, "user_id", "event_type", "view", "purchase").collect().head
    val byV = (1L to 20L).groupBy(variantOf)
    val (na, nb) = (byV("A").size.toLong, byV("B").size.toLong)
    val (ca, cb) = (byV("A").count(_ % 2 == 0).toLong, byV("B").count(_ % 2 == 0).toLong)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")) == ((na, ca, nb, cb)))
    assert(r.getAs[Long]("rate_a_micro") == ca * 1000000L / na)
    val chi2 = ((na + nb).toDouble
      * ((ca.toDouble * (nb - cb).toDouble) - ((na - ca).toDouble * cb.toDouble))
      * ((ca.toDouble * (nb - cb).toDouble) - ((na - ca).toDouble * cb.toDouble))) /
      (((na.toDouble * nb.toDouble) * (ca + cb).toDouble) * (na + nb - ca - cb).toDouble)
    assert(r.getAs[Double]("chi2") == chi2)
    // everyone converts -> the non-converted margin is 0 -> NULL, not NaN
    val all = (1L to 6L).flatMap(u => Seq((u, "view"), (u, "purchase")))
      .toDF("user_id", "event_type")
    assert(Behavior.abTest(all, "user_id", "event_type", "view", "purchase")
      .collect().head.isNullAt(6))
  }

  test("survivalKm: hand risk sets, horizon censoring, n==d poisons the tail") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    val evs = Seq(
      (1L, ts(0), "view"), (1L, ts(0), "purchase"),
      (2L, ts(0), "view"), (2L, ts(2), "purchase"),
      (3L, ts(0), "view"), (3L, ts(7), "purchase"), // beyond horizon -> censored at 5
      (4L, ts(0), "view") // never converts -> censored at 5
    ).toDF("user_id", "ts", "event_type")
    val r = Behavior.survivalKm(evs, "user_id", "ts", "event_type", "purchase", 5)
      .orderBy("t_days").collect()
    // qln(2)=693147 qln(3)=1098612 qln(4)=1386294
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ==
      Seq((0L, 4L, 1L, 1098612L - 1386294L), (2L, 3L, 1L, 693147L - 1386294L)))
    // a risk set fully consumed by events: S hits exact 0 -> NULL log
    val all = Seq((1L, ts(0), "view"), (1L, ts(1), "purchase"),
      (2L, ts(0), "view"), (2L, ts(1), "purchase")).toDF("user_id", "ts", "event_type")
    val p = Behavior.survivalKm(all, "user_id", "ts", "event_type", "purchase", 5).collect()
    assert(p.length == 1 && p.head.getLong(1) == 2L && p.head.getLong(2) == 2L
      && p.head.isNullAt(3))
  }

  test("clusteringDepth: disjoint zones 0, overlapping counted, null zone safe") {
    val zones = Seq(
      (1L, Some(0L), Some(10L)), (2L, Some(11L), Some(20L)), // disjoint
      (3L, Some(5L), Some(15L)), // overlaps both
      (4L, None, None) // all-null key file
    ).toDF("zone", "mn", "mx")
    val r = Layout.clusteringDepth(zones, "zone", "mn", "mx")
      .orderBy("zone").collect().map(x => (x.getLong(0), x.getAs[Long]("n_overlaps")))
    assert(r.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 0L)))
  }

  test("unigramLm hard-EM: lossless segmentation, zero-count pruning, determinism") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 5)) }
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramLm(docs, "text", seedMinCount = 5L).collect()
    assert(vocab.nonEmpty)
    // chars immortal; multi-char pieces only survive with Viterbi mass
    vocab.foreach { r =>
      val (p, c) = (r.getString(0), r.getLong(1))
      assert(p.length == 1 || c > 0L, s"pruned-but-present piece $p (cnt $c)")
      assert(p.length <= 4)
    }
    val chars = vocab.map(_.getString(0)).filter(_.length == 1).toSet
    assert(words.flatMap(_.toSeq).map(_.toString).toSet.subsetOf(chars))
    // encode is lossless and deterministic
    val enc = TextAnalysis.unigramEncode(docs, "text", seedMinCount = 5L)
      .orderBy("word").collect()
    enc.foreach { r =>
      assert(r.getAs[String]("pieces").replace(" ", "") == r.getString(0),
        s"${r.getString(0)} -> ${r.getAs[String]("pieces")}")
      assert(r.getAs[Long]("n_pieces") == r.getAs[String]("pieces").split(" ").length.toLong)
    }
    val enc2 = TextAnalysis.unigramEncode(docs, "text", seedMinCount = 5L)
      .orderBy("word").collect()
    assert(enc.toSeq == enc2.toSeq)
    // segmentation under a trained LM never uses MORE pieces than greedy
    // chars (sanity: scores reward frequent multi-char pieces)
    assert(enc.exists(r => r.getAs[Long]("n_pieces") < r.getString(0).length),
      "no word segmented into a multi-char piece — vocabulary never learned")
  }

  test("wordpiece segmentation is lossless: pieces reassemble every word (randomized corpus)") {
    val rnd = new scala.util.Random(42)
    val words = (1 to 120).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 4)) }
      .toDF("doc_id", "text")
    val r = TextAnalysis.wordpiece(docs, "text").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val rebuilt = row.getAs[String]("pieces").replace(" ##", "")
      assert(rebuilt == row.getString(0),
        s"${row.getString(0)} -> ${row.getAs[String]("pieces")}")
    }
  }

  test("wordpiece: greedy longest match, position-dependent vocab, rare words fall to chars") {
    val docs = ((1 to 60).map(i => (i.toLong, "unhappy happy")) ++
      (61 to 63).map(i => (i.toLong, "zq"))).toDF("doc_id", "text")
    val r = TextAnalysis.wordpiece(docs, "text").orderBy("word").collect()
      .map(x => (x.getString(0), x.getAs[Long]("n_pieces"), x.getAs[String]("pieces"))).toSeq
    // 4-char prefixes carry the mass -> greedy takes them; the rare word's
    // 2-char prefix misses the threshold and segments to single chars
    assert(r == Seq(
      ("happy", 2L, "happ ##y"),
      ("unhappy", 2L, "unha ##ppy"),
      ("zq", 2L, "z ##q")))
  }

  test("collocationsLlr: associated pair scores positive, lone bigram carries no evidence") {
    val docs = Seq((1L, "a b a b a b a b"), (2L, "c d"), (3L, "c e")).toDF("doc_id", "text")
    val r = TextAnalysis.collocationsLlr(docs, "text", minCount = 1L)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getAs[Long]("llr_scaled"))).toMap
    // (a,b) co-occurs far above independence in this corpus
    assert(r(("a", "b")) > 0L)
    // a corpus that IS one bigram: all four cells collapse, G2 = 0 exactly
    val one = Seq((1L, "x y")).toDF("doc_id", "text")
    val r1 = TextAnalysis.collocationsLlr(one, "text", minCount = 1L).collect()
    assert(r1.length == 1 && r1.head.getAs[Long]("llr_scaled") == 0L)
  }

  test("readability: hand sentence/word/syllable counts and fixed-point score") {
    val docs = Seq((1L, "The cat sat. It ran!"), (2L, "Extraordinary.")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_sentences") == 2L && r(0).getAs[Long]("n_words") == 5L
      && r(0).getAs[Long]("n_syllables") == 5L)
    // 206835 - 1015*5 div 2 - 84600*5 div 5 = 206835 - 2537 - 84600
    assert(r(0).getAs[Long]("flesch_milli") == 119698L)
    // vowel groups of "extraordinary": e|ao|i|a|y = 5
    assert(r(1).getAs[Long]("n_syllables") == 5L)
  }

  test("robustScale: hand quartiles, endpoints at ±1e6, constant column yields NULL") {
    val df = (0L to 8L).map(i => (i, i)).toDF("id", "v")
    val r = Features.robustScale(df, "id", "v").orderBy("id").collect()
    assert(r.head.getAs[Long]("robust_micro") == -1000000L)
    assert(r(4).getAs[Long]("robust_micro") == 0L)
    assert(r.last.getAs[Long]("robust_micro") == 1000000L)
    assert(r.head.getAs[Long]("iqr_x4") == 16L)
    val const = (1L to 5L).map(i => (i, 7L)).toDF("id", "v")
    assert(Features.robustScale(const, "id", "v").collect().forall(_.isNullAt(4)))
  }

  test("completeness: per-group null rates, one pass, exact per-mille") {
    val df = Seq(
      ("A", Some("x"), 1L), ("A", None, 2L), ("A", Some("y"), 3L), ("A", Some("z"), 4L),
      ("B", None, 5L), ("B", None, 6L)).toDF("src", "s", "n")
    val r = graft.operators.Quality.completeness(df, "src", Seq("s", "n"))
      .orderBy("src", "column").collect()
      .map(x => (x.getString(0), x.getAs[String]("column"),
        x.getAs[Long]("n_nulls"), x.getAs[Long]("null_permille")))
    assert(r.toSeq == Seq(
      ("A", "n", 0L, 0L), ("A", "s", 1L, 250L),
      ("B", "n", 0L, 0L), ("B", "s", 2L, 1000L)))
  }

  test("clusteringCoeff: triangle 1.0, path 0, diagonal square hand values") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.clusteringCoeff(tri, "src", "dst").collect()
      .forall(_.getAs[Long]("cc_micro") == 1000000L))
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.clusteringCoeff(path, "src", "dst").collect()
      .forall(_.getAs[Long]("cc_micro") == 0L))
    // square + one diagonal: hub nodes close 2 of 3 wedges, corners all 1
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.clusteringCoeff(sq, "src", "dst").orderBy("node").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("cc_micro")))
    assert(r.toSeq == Seq((1L, 666666L), (2L, 1000000L), (3L, 666666L), (4L, 1000000L)))
  }

  test("classBalance: majority capped at ratio x minority, minority untouched") {
    val df = ((1L to 5L).map(i => (i, "A")) ++ Seq((10L, "B"), (11L, "B")))
      .toDF("id", "cls")
    val kept = Sampling.classBalance(df, "id", "cls", ratio = 2L)
      .groupBy("cls").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept == Map("A" -> 4L, "B" -> 2L))
  }

  test("filter_lm pipeline step: garbled docs drop, fluent and no-bigram docs survive") {
    val docs = Seq((1L, "a a a a"), (2L, "a a a a"), (3L, "a a a a"),
      (4L, "b c"), (5L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.CurationPipeline.runYaml(docs, "doc_id", "text",
      "steps:\n  - { op: filter_lm, min_avg_micro: -200000 }\n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // "b c" is a one-off bigram (avg -405465 micro-nats) -> dropped;
    // the zero-bigram doc carries no evidence -> kept
    assert(out == Seq(1L, 2L, 3L, 5L))
    // missing required parameter fails at parse time, before any job
    val e = intercept[graft.operators.CurationPipeline.PipelineException] {
      graft.operators.CurationPipeline.runYaml(docs, "doc_id", "text",
        "steps:\n  - { op: filter_lm }\n")
    }
    assert(e.errors.exists(_.contains("min_avg_micro")))
  }

  test("touch attribution: first and last credits each sum to the attributed purchases") {
    val df = SparkEntry.queries("events_touch_attribution")(spark, "/root/testdata/sf0.001")
    val r = df.agg(sum("n_first"), sum("n_last")).head()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) > 0)
  }

  test("normHistogram: mass conserved, tails clamp into the frame") {
    val vs = Seq((1L, Seq(1e-3f, 0f)), (2L, Seq(2e-3f, 0f)), (3L, Seq(0f, 0f)))
      .toDF("vec_id", "embedding")
    val h = Embeddings.normHistogram(vs, "embedding", width = 1000000L, buckets = 4)
    assert(h.agg(sum("n_vecs")).head().getLong(0) == 3L)
    // n2 values: 1e6, 4e6 (clamps to top bucket 3), 0
    val m = h.collect().map(r => (r.getLong(0), r.getAs[Long]("n_vecs"))).toMap
    assert(m == Map(0L -> 1L, 1L -> 1L, 3L -> 1L))
  }

  test("scd2Apply: chains close and open, new keys insert, dup batches refuse") {
    import graft.operators.Upsert
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val snap = Seq((1L, 10.0, ts("2020-01-01 00:00:00")), (2L, 20.0, ts("2020-01-01 00:00:00")))
      .toDF("k", "bal", "eff")
    val init = Upsert.initScd2(snap, "k", "eff", Seq("bal"))
    val ch = Seq((1L, 11.0, ts("2021-01-01 00:00:00")), (3L, 30.0, ts("2021-01-01 00:00:00")))
      .toDF("k", "bal", "eff")
    val h = Upsert.scd2Apply(init, ch, "k", "eff", Seq("bal"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(2), Option(r.getTimestamp(3)).isDefined,
        r.getAs[Long]("is_current")))
    assert(h.toSeq == Seq(
      (1L, 10.0, true, 0L), // closed old version
      (1L, 11.0, false, 1L), // opened new version
      (2L, 20.0, false, 1L), // untouched key
      (3L, 30.0, false, 1L))) // brand-new key
    // two changes for one key in a batch is ambiguous — refused, not picked
    val dup = Seq((1L, 1.0, ts("2022-01-01 00:00:00")), (1L, 2.0, ts("2022-02-01 00:00:00")))
      .toDF("k", "bal", "eff")
    intercept[IllegalArgumentException] {
      Upsert.scd2Apply(init, dup, "k", "eff", Seq("bal"))
    }
    // a NULL effective time would leave two is_current versions — refused
    val nullEff = Seq((1L, 1.0, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("k", "bal", "eff")
    intercept[IllegalArgumentException] {
      Upsert.scd2Apply(init, nullEff, "k", "eff", Seq("bal"))
    }
    // an effective time BEFORE the open version inverts the interval —
    // raises at execution rather than corrupting the chain
    val backwards = Seq((1L, 1.0, ts("2019-06-01 00:00:00"))).toDF("k", "bal", "eff")
    val e = intercept[Exception] {
      Upsert.scd2Apply(init, backwards, "k", "eff", Seq("bal")).collect()
    }
    assert(e.getMessage.contains("effective time precedes"), e.getMessage)
    // an EMPTY incremental batch is a realistic no-op, not an NPE (the
    // validation sums over zero groups are NULL without the coalesce)
    val empty = Seq.empty[(Long, Double, java.sql.Timestamp)].toDF("k", "bal", "eff")
    val noop = Upsert.scd2Apply(init, empty, "k", "eff", Seq("bal"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getAs[Long]("is_current")))
    assert(noop.toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("completeness survives quoted / spaced / dotted column names") {
    import graft.operators.Quality
    val df = Seq(("a", Some(1L), "x"), ("a", None, "y"))
      .toDF("src", "weird col", "it's.dotted")
    val r = Quality.completeness(df, "src", Seq("weird col", "it's.dotted"))
      .orderBy("column").collect()
      .map(x => (x.getAs[String]("column"), x.getAs[Long]("n_nulls")))
    assert(r.toSeq == Seq(("it's.dotted", 0L), ("weird col", 1L)))
    intercept[IllegalArgumentException] {
      Quality.completeness(df.withColumnRenamed("weird col", "back`tick"),
        "src", Seq("back`tick"))
    }
  }

  test("weeklyProfile: ISO dow mapping, shares and peak flag hand case") {
    // 2024-01-01 is a Monday
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    val evs = (Seq.fill(5)(ts(0, 9)) ++ Seq(ts(1, 14), ts(6, 23))).map(Tuple1(_)).toDF("ts")
    val r = Behavior.weeklyProfile(evs, "ts").orderBy("dow", "hour").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getAs[Long]("share_permille")))
    // ISO mapping: Jan 1 -> Monday(1), Jan 2 -> Tuesday(2), Jan 7 -> Sunday(7);
    // shares are truncating per-mille of the 7-event total
    assert(r.toSeq == Seq((1L, 9L, 5L, 714L), (2L, 14L, 1L, 142L), (7L, 23L, 1L, 142L)))
  }

  test("burstVelocity: a 10-minute burst dominates politely spaced traffic") {
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val evs = (
      // user 1: 6 events within 10 minutes -> some window holds all 6
      (0L until 6L).map(i => (1L, ts(i * 2))) ++
      // user 2: 6 events spaced 2 h apart -> no window holds more than 1
      (0L until 6L).map(i => (2L, ts(i * 120)))).toDF("user_id", "ts")
    val r = Behavior.burstVelocity(evs, "user_id", "ts").orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("peak_n")))
    assert(r.toSeq == Seq((1L, 6L), (2L, 1L)))
  }

  test("centroidOutliers: hand centroid and distances, far point flagged") {
    val vs = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(2e-6f, 0f), 0),
      (3L, Seq(0f, 2e-6f), 0), (4L, Seq(100e-6f, 100e-6f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Embeddings.centroidOutliers(vs, "vec_id", "embedding", "label")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("dist2"), x.getAs[Long]("is_outlier")))
    // centroid = (25, 25) by truncating integer mean; med_x2 = 2404
    assert(r.toSeq == Seq(
      (1L, 1250L, 0L), (2L, 1154L, 0L), (3L, 1154L, 0L), (4L, 11250L, 1L)))
  }

  test("userEntropy: single-type user scores 0, balanced two-type user ln 2") {
    val evs = (Seq.fill(4)((1L, "click")) ++
      Seq((2L, "click"), (2L, "click"), (2L, "view"), (2L, "view")))
      .toDF("user_id", "event_type")
    val r = Behavior.userEntropy(evs, "user_id", "event_type")
      .orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_types"), x.getAs[Long]("entropy_micro")))
    assert(r.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 693147L)))
  }

  test("bigramLogProb: hand corpus, add-one smoothing, per-doc qln sums") {
    val docs = Seq((1L, "a b"), (2L, "a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_bigrams"), x.getAs[Long]("logprob_scaled")))
    // c12(a,b)=3, c12(b,a)=1, c1(a)=3, c1(b)=1, V=2
    // doc1: qln(4)-qln(5) = -223144; doc2: 2*(qln4-qln5) + (qln2-qln3)
    assert(r.toSeq == Seq((1L, 1L, -223144L), (2L, 3L, -851753L)))
  }

  test("jsDivergence: identical snapshots score exact 0, disjoint saturate at ln 2") {
    val a = (1L to 100L).map(i => Tuple1(i % 50)).toDF("v")
    assert(Drift.jsDivergence(a, a, "v", width = 10L, buckets = 12)
      .collect().head.getAs[Long]("jsd_micro") == 0L)
    // fully disjoint bucket support: JSD = ln 2 (693147 micro-nats ± trunc)
    val lo = (1L to 100L).map(_ => Tuple1(5L)).toDF("v")
    val hi = (1L to 100L).map(_ => Tuple1(95L)).toDF("v")
    val j = Drift.jsDivergence(lo, hi, "v", width = 10L, buckets = 12)
      .collect().head.getAs[Long]("jsd_micro")
    assert(j >= 693140L && j <= 693150L)
  }

  test("rakeTerms: multi-word phrases outrank, degree/frequency hand case") {
    val docs = Seq((1L, "deep learning of deep nets"), (2L, "learning"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.rakeTerms(docs, "doc_id", "text", k = 10).collect()
      .map(x => (x.getString(0), x.getAs[Long]("score_micro"))).toSeq
    // deg(deep)=4 freq 2 -> 2e6; learning deg 3 freq 2 -> 1.5e6; nets 2e6
    assert(r == Seq(
      ("deep nets", 4000000L),
      ("deep learning", 3500000L),
      ("learning", 1500000L)))
  }

  test("gif codec: LZW round-trip, palette-mapped stats, dictionary-reset survival") {
    // high-entropy 200x150 image: 30k pixels of quasi-random indices force
    // the dictionary past 4096 entries, exercising clear-code emission,
    // post-reset re-sync, and every code width from 9 to 12 bits
    def idx(x: Int, y: Int): Int = (x * 31 + y * 17 + x * y) % 256
    val bytes = Multimodal.gifEncode(200, 150, idx)
    val s = Multimodal.gifDecode(bytes)
    var (sr, sg, sb, wr) = (0L, 0L, 0L, 0L)
    for (y <- 0 until 150; x <- 0 until 200) {
      val i = idx(x, y)
      sr += i; sg += (2 * i) % 256; sb += (5 * i + 1) % 256
      wr += (y + 1).toLong * i
    }
    assert((s.width, s.height, s.nPixels) == ((200, 150, 30000L)))
    assert((s.sumR, s.sumG, s.sumB, s.wsumR) == ((sr, sg, sb, wr)))
    // degenerate 1x1 image
    val one = Multimodal.gifDecode(Multimodal.gifEncode(1, 1, (_, _) => 7))
    assert(one.nPixels == 1L && one.sumR == 7L && one.sumG == 14L && one.sumB == 36L)
  }

  test("bmpPhash: constant image hashes to 0, mirrors collide, banding is lossless") {
    // constant image: every AC coefficient is 0 -> nothing above the mean
    val flat = Multimodal.bmpEncode(16, 12, (_, _) => (128, 128, 128))
    assert(Multimodal.bmpPhash(flat) == 0L)
    // textured fixtures: equal sid => byte-identical image => Hamming 0;
    // the banded candidate join must reproduce the naive all-pairs result
    val ids = Seq((0L, 0L), (1L, 1L), (2L, 2L), (100L, 0L), (101L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "sid")
    val h = Multimodal.phashBmp(Multimodal.bmpFixturesTextured(ids), "doc_id")
    val hs = h.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hs(0L) == hs(100L) && hs(1L) == hs(101L))
    val pairs = Multimodal.phashPairs(h, "doc_id", "phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs == naive && pairs.contains((0L, 100L, 0L)))
    // band layouts that cannot tile the 64-bit hash are refused up front —
    // a 16-bit stride past 4 bands would alias and silently drop pairs
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(h, "doc_id", "phash", maxDist = 4, bands = 5)
    }
  }

  test("assortativity: star is perfectly disassortative, cycle degenerate, symmetric fit") {
    // star K1,4: every edge joins the deg-4 hub to a deg-1 leaf -> r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val sf = Graph.assortativity(star, "src", "dst").collect().head
    assert(sf.getAs[Long]("slope_micro") == -1000000L)
    // symmetrized marginals: sx == sy and n == 2|E|
    assert(sf.getAs[Long]("sx") == sf.getAs[Long]("sy"))
    assert(sf.getAs[Long]("n") == 8L)
    // cycle: all degrees equal -> zero variance -> NULL slope, not a crash
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(Graph.assortativity(cyc, "src", "dst").collect().head.isNullAt(5))
  }

  test("modularity: two clean triangles score high, one community covers everything") {
    val tri2 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(tri2, "src", "dst", rounds = 2)
    val q = Graph.modularity(tri2, "src", "dst", labels).orderBy("label").collect()
    // two communities of 3 nodes, 3 intra edges, degree mass 6 each;
    // contribution = (4*6*3 - 36)*1e6 div 144 = 250000 each -> Q = 0.5
    assert(q.length == 2)
    assert(q.forall(r => r.getAs[Long]("n_nodes") == 3L && r.getAs[Long]("m_in") == 3L
      && r.getAs[Long]("d_sum") == 6L && r.getAs[Long]("q_micro") == 250000L))
    // one label over the whole graph -> m_in = m, d_sum = 2m -> Q = 0
    val one = labels.select(col("node"), lit(0L).as("label"))
    val q1 = Graph.modularity(tri2, "src", "dst", one).collect()
    assert(q1.length == 1 && q1.head.getAs[Long]("q_micro") == 0L)
  }

  test("bfsHops: path distances from one seed, rounds bound the radius, min over seeds") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("k")
    val d = Graph.bfsHops(path, "src", "dst", seeds, "k", rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // radius 3: nodes 5,6 unreached
    assert(d.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
    // two seeds: distance is the min over both frontiers
    val d2 = Graph.bfsHops(path, "src", "dst", Seq(1L, 6L).toDF("k"), "k", rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d2.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L), (6L, 0L)))
  }

  test("covarianceNum: hand 2x2 case, diagonal equals per-dim power-sum numerator") {
    val vs = Seq((1L, Seq(1e-6f, 2e-6f)), (2L, Seq(3e-6f, 4e-6f)))
      .toDF("vec_id", "embedding")
    val c = Embeddings.covarianceNum(vs, "vec_id", "embedding")
      .orderBy("i", "j").collect()
    // quantized vectors are [1,2] and [3,4]: n*s_ij - s_i*s_j
    assert(c.map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cov_num"))).toSeq ==
      Seq((0L, 0L, 4L), (0L, 1L, 4L), (1L, 1L, 4L)))
    // diagonal must agree with the power-sum variance numerator per dim
    val el = vs.select(posexplode(VectorFns.quantize(col("embedding"))).as(Seq("i", "x")))
    val ps = Features.powerSums(el, "i", "x").orderBy("i").collect()
    val diag = c.filter(r => r.getLong(0) == r.getLong(1)).map(_.getAs[Long]("cov_num"))
    assert(ps.map(_.getAs[Long]("var_num")).toSeq == diag.toSeq)
  }

  test("overlap join equals the naive predicate, one row per pair even across many buckets") {
    val a = Seq((1L, 0.0, 100.0), (2L, 10.0, 12.0), (3L, 200.0, 210.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 50.0, 150.0), (11L, 11.0, 11.5), (12L, 100.0, 120.0), (13L, 210.0, 220.0))
      .toDF("bid", "blo", "bhi")
    val got = RangeJoin.overlap(a, "alo", "ahi", b, "blo", "bhi", bucketWidth = 7.0)
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.crossJoin(b)
      .filter(col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // interval 1 spans ~15 buckets and interval 10 ~15 — the pair still
    // emits exactly once; [100,120) vs [0,100) touch but do NOT overlap;
    // [200,210) vs [210,220) likewise
    assert(got == want)
    assert(want == Seq((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("rrfFuse: item in both lists outranks single-list items, missing list contributes 0") {
    val a = Seq((1L, 100L, 1), (1L, 200L, 2)).toDF("q", "item", "rank")
    val b = Seq((1L, 200L, 1), (1L, 300L, 2)).toDF("q", "item", "rank")
    val f = Eval.rrfFuse(a, b, "q", "item", "rank")
      .orderBy("fused_rank").collect()
    // item 200 appears in both lists (ranks 2 and 1): 1e12/62 + 1e12/61
    assert(f.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 200L), (2, 100L), (3, 300L)))
    assert(f(0).getAs[Long]("rrf_scaled") ==
      1000000000000L / 62 + 1000000000000L / 61)
    assert(f(1).getAs[Long]("rrf_scaled") == 1000000000000L / 61)
    assert(f(2).getAs[Long]("rrf_scaled") == 1000000000000L / 62)
  }

  test("forecastAnomaly: signed flags against the same-hour-yesterday baseline") {
    val ts = (d: Int, h: Int) => java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:30:00")
    val day1 = Seq(5, 5, 22, 5)
    val day2 = Seq(5, 40, 2, 5)
    val rows = (for {
      (c, h) <- day1.zipWithIndex; i <- 1 to c
    } yield (i.toLong, ts(1, h))) ++ (for {
      (c, h) <- day2.zipWithIndex; i <- 1 to c
    } yield (i.toLong, ts(2, h)))
    val ev = rows.toDF("event_id", "ts")
    // errs x2 = {0, 70, -40, 0} -> median_x2 0, mad_x2 20; k=1 band = 20
    val r = Behavior.forecastAnomaly(ev, "ts", k = 1L).orderBy("hour").collect()
    assert(r.map(_.getAs[Long]("err")).toSeq == Seq(0L, 35L, -20L, 0L))
    assert(r.map(_.getAs[Long]("flag")).toSeq == Seq(0L, 1L, -1L, 0L))
    assert(r.forall(_.getAs[Long]("median_x2") == 0L))
    assert(r.forall(_.getAs[Long]("mad_x2") == 20L))
  }

  test("pcaPower: principal direction locks onto the dominant-variance dimension") {
    // dim 0 swings ±0.4, the rest jitter at ±0.001 — the top component
    // must saturate on dim 0 (|v| = the 1e6 norm cap) and stay tiny off it
    val rows = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1.0f else -1.0f
      (k.toLong, Seq(0.4f * sign, 0.001f * ((k % 3) - 1), 0.001f * ((k % 5) - 2)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Embeddings.pcaPower(df, "vec_id", "embedding", rounds = 2)
      .orderBy("dim").collect()
    assert(v.length == 3)
    assert(math.abs(v(0).getAs[Long]("v_scaled")) == 1000000L)
    assert(math.abs(v(1).getAs[Long]("v_scaled")) < 50000L)
    assert(math.abs(v(2).getAs[Long]("v_scaled")) < 50000L)
    // fixed start + fixed rounds => bit-identical rerun
    val v2 = Embeddings.pcaPower(df, "vec_id", "embedding", rounds = 2)
      .orderBy("dim").collect()
    assert(v.toSeq == v2.toSeq)
  }

  test("bigramLm: hand corpus counts, conditional fixed point, per-head top-k") {
    val d = Seq((1L, "a b a b c"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLm(d, "text", topK = 3)
      .orderBy("w1", "rnk").collect()
    // pairs: (a,b)x2, (b,a)x1, (b,c)x2 -> heads a (c1=2), b (c1=3)
    assert(r.map(x => (x.getString(0), x.getInt(1), x.getString(2),
      x.getLong(3), x.getLong(4), x.getLong(5))).toSeq == Seq(
      ("a", 1, "b", 2L, 2L, 1000000L),
      ("b", 1, "c", 2L, 3L, 666666L),
      ("b", 2, "a", 1L, 3L, 333333L)))
  }

  test("linearFit: exact line recovered, noisy fit truncates, degenerate x yields NULL") {
    val exact = Seq((1L, 5L), (2L, 7L), (3L, 9L), (10L, 23L)).toDF("x", "y")
    val e = Features.linearFit(exact, "x", "y").collect()(0)
    assert(e.getAs[Long]("slope_micro") == 2000000L)
    assert(e.getAs[Long]("intercept_micro") == 3000000L)
    // slope 1/2 truncates toward zero in fixed point: 500000
    val half = Seq((0L, 0L), (2L, 1L), (4L, 2L)).toDF("x", "y")
    assert(Features.linearFit(half, "x", "y").collect()(0)
      .getAs[Long]("slope_micro") == 500000L)
    // all-equal x: denominator 0 -> NULL slope, no crash
    val degen = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(Features.linearFit(degen, "x", "y").collect()(0).isNullAt(5))
  }

  test("removeTopComponent: dominant direction annihilated, other dims preserved") {
    val rows = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1.0f else -1.0f
      (k.toLong, Seq(0.4f * sign, 0.001f * ((k % 3) - 1), 0.001f * ((k % 5) - 2)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Embeddings.removeTopComponent(df, "vec_id", "embedding", rounds = 2)
    // dim 1 (the ±400000 axis) collapses to ~0 after projection removal...
    val d1max = out.filter($"dim" === 1)
      .agg(max(abs($"corrected"))).head().getLong(0)
    assert(d1max < 5000L, s"dominant axis residual $d1max")
    // ...while the small orthogonal dims stay essentially untouched
    val d23drift = out.filter($"dim" =!= 1)
      .agg(max(abs($"corrected"))).head().getLong(0)
    assert(d23drift <= 2100L, s"off-axis drift $d23drift")
  }

  test("funnelLatency: per-stage conversion latency quantiles on a hand log") {
    val t0 = 1700000000000000L // µs
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000L)
    val ev = Seq(
      (1L, "view", ts(t0)), (1L, "click", ts(t0 + 10000000L)), (1L, "purchase", ts(t0 + 30000000L)),
      (2L, "view", ts(t0)), (2L, "click", ts(t0 + 20000000L)),
      (3L, "view", ts(t0))
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnelLatency(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("stage").collect()
    assert(r.length == 2)
    // click: lats {10s, 20s} -> n 2, median_x2 30e6, p90 19e6, max 20e6
    assert(r(0).getAs[Long]("n_converted") == 2L)
    assert(r(0).getAs[Long]("median_x2_us") == 30000000L)
    assert(r(0).getAs[Double]("p90_us") == 1.9e7)
    assert(r(0).getAs[Long]("max_us") == 20000000L)
    // purchase: single 20s conversion
    assert(r(1).getAs[Long]("n_converted") == 1L)
    assert(r(1).getAs[Long]("median_x2_us") == 40000000L)
    assert(r(1).getAs[Long]("max_us") == 20000000L)
  }

  test("wavFeatures: zero-transparent crossings, all-channel peak, signed DC sum") {
    // ch0 = 10, -20, 0, 30: sign flips at -20 and (through the transparent
    // zero) at 30 -> zcr 2; peak from ch1's -4..-1 vs ch0 -> 30; dc 20
    val samples = Array[Short](10, -1, -20, -2, 0, -3, 30, -4)
    val f = Multimodal.wavFeatures(Multimodal.wavEncode(8000, 2, samples))
    assert(f.nFrames == 4L && f.channels == 2)
    assert(f.zcrC0 == 2L)
    assert(f.peakAbs == 30L)
    assert(f.dcSumC0 == 20L)
  }

  test("hits: shared authority concentrates score, two-target hub outranks") {
    // 1 -> 10, 1 -> 11, 2 -> 11: node 11 is the stronger authority (two
    // hubs), node 1 the stronger hub (points at both authorities)
    val e = Seq((1L, 10L), (1L, 11L), (2L, 11L)).toDF("src", "dst")
    val r = Graph.hits(e, "src", "dst", rounds = 2)
      .orderBy("kind", "node").collect()
      .map(x => (x.getString(1), x.getLong(0), x.getLong(2))).toSeq
    assert(r == Seq(
      ("auth", 10L, 600000L), ("auth", 11L, 1000000L),
      ("hub", 1L, 1000000L), ("hub", 2L, 625000L)))
  }

  test("hilbertD: exhaustive bijection + unit-step adjacency; Morton provably jumps") {
    // the Hilbert property, enumerated: over the full 8x8 grid the curve
    // visits every cell once and every consecutive index pair is grid-
    // ADJACENT (Manhattan distance exactly 1)
    val cells = for (x <- 0 until 8; y <- 0 until 8)
      yield (Kernels.hilbertD(x, y, 3), x, y)
    assert(cells.map(_._1).sorted == (0L until 64L))
    val walk = cells.sortBy(_._1)
    walk.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent Hilbert step ($x1,$y1)->($x2,$y2)")
    }
    // contrast: the Morton curve breaks adjacency (the jump at index 3->4)
    val morton = (for (x <- 0 until 8; y <- 0 until 8)
      yield (Kernels.interleaveBits(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(x.toLong, y.toLong)), 3), x, y))
      .sortBy(_._1)
    val mortonAdjacent = morton.sliding(2).forall { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(!mortonAdjacent, "Morton should NOT be unit-step — else Hilbert adds nothing")
  }

  test("markovAttribution: sole converting channel takes all credit, untouched channel none") {
    import graft.operators.Behavior
    // users 1-5 touch channel 0 then convert; users 6-10 touch channel 1
    // and never convert; channel 2 is never touched at all
    val touches = ((1L to 5L).map(u => (u, u, u, 0L)) ++ (6L to 10L).map(u => (u, u, u, 1L)))
      .toDF("u", "ts", "id", "ch")
    val conv = (1L to 5L).map(Tuple1(_)).toDF("u")
    val r = Behavior.markovAttribution(touches, "u", "ts", "id", "ch", conv, "u",
      channels = Seq(0L, 1L, 2L))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(3), x.getLong(4))).toMap
    assert(r(0)._1 == 500000L, s"base: $r") // 5/10 journeys convert
    assert(r(0)._2 == 500000L && r(0)._3 == 1000000L, s"ch0: $r") // removal kills ALL conversion
    assert(r(1)._2 == 0L && r(2)._2 == 0L, s"non-converting/untouched: $r")
  }

  test("markovSteadyState: flip chain keeps the uniform split, absorbing state drains") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // deterministic flip A<->B: the uniform start is stationary exactly
    val flip = Seq((1L, "A", ts(1), 1L), (1L, "B", ts(2), 2L),
      (1L, "A", ts(3), 3L), (1L, "B", ts(4), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val f = Behavior.markovSteadyState(flip, "user_id", "event_type", "ts", "event_id")
      .orderBy("state").collect()
    assert(f.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 500000L), ("B", 500000L)))
    // absorbing B (A->B once, B->B after): all mass drains to B
    val drain = Seq((2L, "A", ts(1), 1L), (2L, "B", ts(2), 2L),
      (2L, "B", ts(3), 3L), (2L, "B", ts(4), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val d = Behavior.markovSteadyState(drain, "user_id", "event_type", "ts", "event_id")
      .orderBy("state").collect()
    assert(d.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 0L), ("B", 1000000L)))
  }

  test("abcClasses boundary rule and stickiness ratio on hand data") {
    // values 80/15/5: exclusive-prior shares 0/800/950 permille -> A/B/C
    // (the key that lands exactly ON a boundary starts the next class)
    val t3 = Seq((1L, 80L), (2L, 15L), (3L, 5L)).toDF("k", "cents")
    val abc = Features.abcClasses(t3, "k", $"cents")
      .orderBy("key").collect()
    assert(abc.map(r => (r.getLong(0), r.getString(4))).toSeq ==
      Seq((1L, "A"), (2L, "B"), (3L, "C")))
    assert(abc.map(_.getAs[Long]("prev_permille")).toSeq == Seq(0L, 800L, 950L))
    // stickiness: 2 days, users {1,2} then {1} within one month ->
    // mau 2, ratios 1.0 and 0.5
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (1L, ts(2)))
      .toDF("user_id", "ts")
    val st = Behavior.stickiness(ev, "user_id", "ts").orderBy("day").collect()
    assert(st.map(r => (r.getAs[Long]("dau"), r.getAs[Long]("mau"),
      r.getAs[Long]("stickiness_micro"))).toSeq ==
      Seq((2L, 2L, 1000000L), (1L, 2L, 500000L)))
  }

  test("journeyPairs: banding lossless vs naive quadratic, identical journeys at dist 0") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // users with journeys of varied LENGTH so the length bands actually
    // split: u1 "vcp", u2 "vcp" (twin), u3 "vc", u4 "vcpvcpvcp" (far)
    def u(id: Long, types: String*) = types.zipWithIndex.map {
      case (t, i) => (id, t, ts(i + 1), i.toLong)
    }
    val ev = (u(1L, "view", "click", "purchase") ++ u(2L, "view", "click", "purchase") ++
      u(3L, "view", "click") ++
      u(4L, "view", "click", "purchase", "view", "click", "purchase", "view", "click", "purchase"))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.journeyPairs(ev, "user_id", "event_type", "ts", "event_id",
      maxDist = 2, maxLen = 40)
      .orderBy("user_a", "user_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // naive truth: (1,2) dist 0; (1,3)/(2,3) dist 1; u4 at distance 6 from
    // everyone — and in a far band, so the blocking must also DROP it
    assert(got == Seq((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("bmpHistogram: known-luma pixels land in exact buckets, counts conserve pixels") {
    // black (lum 0 -> bucket 0), white (255 -> 7), pure red (lum 76 -> 2),
    // pure green (lum 149 -> 4)
    val img = Multimodal.bmpEncode(2, 2, (x, y) => (x, y) match {
      case (0, 0) => (0, 0, 0)
      case (1, 0) => (255, 255, 255)
      case (0, 1) => (255, 0, 0)
      case _ => (0, 255, 0)
    })
    val h = Multimodal.bmpHistogram(img)
    assert(h.sum == 4L)
    assert(h(0) == 1L && h(7) == 1L && h(2) == 1L && h(4) == 1L)
  }

  test("fkOrphans: planted orphan reported with key range, clean relation reports zero, null keys pass") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(98L)))
      .toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    val r = Quality.fkOrphans(Seq(("c->p", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getAs[Long]("n_child") == 4L)
    // null child key is NOT an orphan (SQL FK semantics)
    assert(r.getAs[Long]("n_orphans") == 2L)
    assert(r.getAs[Long]("min_orphan_key") == 98L)
    assert(r.getAs[Long]("max_orphan_key") == 99L)
    val clean = Quality.fkOrphans(Seq(("ok", child.filter($"fk" === 10L), "fk", parent, "pk")))
      .collect()(0)
    assert(clean.getAs[Long]("n_orphans") == 0L && clean.isNullAt(3))
  }

  test("giniOf: zero for even contribution, (n-1)/n for total concentration") {
    val even = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L)).toDF("g", "w")
    assert(Features.giniOf(even, "g", $"w").collect()(0).getAs[Long]("gini_micro") == 0L)
    val conc = Seq(("a", 40L), ("b", 0L), ("c", 0L), ("d", 0L)).toDF("g", "w")
    assert(Features.giniOf(conc, "g", $"w").collect()(0).getAs[Long]("gini_micro") == 750000L)
  }

  test("zone compare: integral types compare exactly above 2^53, mixed widths widen to long") {
    val big = (1L << 53) + 1L // indistinguishable from 2^53 as a double
    assert(Layout.cmpAny(big, 1L << 53) > 0, "adjacent >2^53 longs must not compare equal")
    assert(Layout.cmpAny(java.lang.Long.valueOf(big),
      java.lang.Integer.valueOf(42)) > 0)
    assert(Layout.cmpAny(java.lang.Integer.valueOf(7),
      java.lang.Long.valueOf(7L)) == 0)
    assert(Layout.cmpAny(java.lang.Double.valueOf(2.5),
      java.lang.Integer.valueOf(2)) > 0, "float probes keep the double path")
  }

  test("aucExact: perfect separator 1e6, anti-separator 0, ties average, bad label raises") {
    import org.apache.spark.sql.functions.col
    val perfect = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L)).toDF("s", "y")
    val p = Eval.aucExact(perfect, col("s"), col("y")).collect()(0)
    assert(p.getAs[Long]("auc_micro") == 1000000L)
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)
    val anti = Seq((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L)).toDF("s", "y")
    assert(Eval.aucExact(anti, col("s"), col("y")).collect()(0)
      .getAs[Long]("auc_micro") == 0L)
    // one tied pair (score 2.0 shared by a pos and a neg) contributes 1/2:
    // pairs = 4, conc = 3, tie = 1 -> auc = 3.5/4 = 0.875
    val tied = Seq((1.0, 0L), (2.0, 1L), (2.0, 0L), (3.0, 1L)).toDF("s", "y")
    assert(Eval.aucExact(tied, col("s"), col("y")).collect()(0)
      .getAs[Long]("auc_micro") == 875000L)
    val bad = Seq((1.0, 2L)).toDF("s", "y")
    assertThrows[Exception](Eval.aucExact(bad, col("s"), col("y")).collect())
    // NULL scores order differently across engines — refused, not ranked
    val nullScore = Seq((Option.empty[Double], 1L), (Some(1.0), 0L)).toDF("s", "y")
    assertThrows[Exception](Eval.aucExact(nullScore, col("s"), col("y")).collect())
  }

  test("classMetrics: hand confusion incl. a prediction-only class and a truth-only class") {
    import org.apache.spark.sql.functions.col
    // truth: a a a b ; pred: a a b c  -> class a: tp=2 fp=0 fn=1;
    // b: tp=0 fp=1 fn=1; c: prediction-only, tp=0 fp=1 fn=0
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "c")).toDF("t", "p")
    val m = Eval.classMetrics(df, col("t"), col("p"))
      .collect().map(r => r.getAs[String]("cls") -> r).toMap
    assert(m("a").getAs[Long]("tp") == 2L && m("a").getAs[Long]("fp") == 0L
      && m("a").getAs[Long]("fn") == 1L)
    assert(m("a").getAs[Long]("precision_milli") == 1000L)
    assert(m("a").getAs[Long]("recall_milli") == 666L)
    assert(m("a").getAs[Long]("f1_milli") == 800L) // 2*2/(4+0+1)
    assert(m("c").getAs[Long]("n_actual") == 0L && m("c").getAs[Long]("fp") == 1L
      && m("c").getAs[Long]("f1_milli") == 0L)
    assert(m("b").getAs[Long]("tp") == 0L && m("b").getAs[Long]("fn") == 1L)
  }

  test("apAtK: perfect ranking scores 1e6, miss scores 0, partial credit exact") {
    import org.apache.spark.sql.functions.col
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("q", "i")
    // q1: hits at ranks 1 and 2 (perfect); q2: no relevant candidate
    val cand = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 99L, 1L)).toDF("q", "i", "r")
    val m = Eval.apAtK(truth, cand, "q", "i", "r", k = 10)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(m(1L).getAs[Long]("ap_micro") == 1000000L)
    assert(m(2L).getAs[Long]("ap_micro") == 0L && m(2L).getAs[Long]("n_truth") == 1L)
    // hit at rank 2 only, |truth|=2: ap = (1e6 * 1/2) / 2 = 250000
    val cand2 = Seq((1L, 99L, 1L), (1L, 10L, 2L)).toDF("q", "i", "r")
    val m2 = Eval.apAtK(truth.filter(col("q") === 1L), cand2, "q", "i", "r")
      .collect()(0)
    assert(m2.getAs[Long]("ap_micro") == 250000L)
  }

  test("binaryQuantize: bits_set consistent with words, dim cap raises") {
    import org.apache.spark.sql.functions.{bit_count, col}
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f, -0.5f)),
      (2L, Array(-1.0f, 1.0f, -0.5f, 0.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val bq = Embeddings.binaryQuantize(df, "id", "v")
    val rows = bq.withColumn("pc",
      (bit_count(col("word_lo")) + bit_count(col("word_hi"))).cast("long")).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("bits_set") == r.getAs[Long]("pc"))
      assert(r.getAs[Long]("word_lo") >= 0L && r.getAs[Long]("word_hi") == 0L,
        "4 dims live entirely in the low word")
    }
    // thresholds are per-dim means of the quantized values (mean of
    // {1e6,-1e6,0} truncates toward zero to 0): id=1 exceeds on dims 0,2
    val m = rows.map(r => r.getAs[Long]("id") -> r.getAs[Long]("word_lo")).toMap
    assert(m(1L) == 5L && m(2L) == 10L && m(3L) == 0L)
    val wide = Seq((1L, Array.fill(65)(1.0f))).toDF("id", "v")
    assertThrows[Exception](Embeddings.binaryQuantize(wide, "id", "v").collect())
  }

  test("covShift: identical populations shift zero, sub-2-vector population raises") {
    import org.apache.spark.sql.functions.col
    val pop = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 1.0f)),
      (3L, Array(2.0f, 2.0f))).toDF("id", "v")
    val same = Drift.covShift(pop, pop, "id", "v").collect()
    assert(same.length == 3 && same.forall(_.getAs[Long]("shift") == 0L))
    val tiny = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    assertThrows[Exception](Drift.covShift(pop, tiny, "id", "v").collect())
    // mismatched dimensionality must raise, not silently drop the extra dims
    val threeD = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(2.0f, 1.0f, 0.0f)))
      .toDF("id", "v")
    assertThrows[Exception](Drift.covShift(pop, threeD, "id", "v").collect())
  }

  test("bigramLogProbHeldout: self-scoring equals bigramLogProb, unseen text floors, empty doc retained") {
    val train = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    // scoring the training set itself must reproduce the in-sample scorer
    val self = TextAnalysis.bigramLogProbHeldout(train, train, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"logprob_scaled")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val insample = TextAnalysis.bigramLogProb(train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(self == insample)
    // a doc of entirely-unseen words scores the add-one floor -qln(V) per
    // bigram (V = 4 successors: b, a, c, d); an empty doc keeps its row
    val held = Seq((10L, "x y z"), (11L, "")).toDF("doc_id", "text")
    val h = TextAnalysis.bigramLogProbHeldout(train, held, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val qlnV = math.floor(math.log(4.0) * 1e6 + 0.5).toLong
    assert(h(10L).getAs[Long]("n_bigrams") == 2L)
    assert(h(10L).getAs[Long]("logprob_scaled") == -2L * qlnV)
    assert(h(11L).getAs[Long]("n_bigrams") == 0L && h(11L).isNullAt(3))
  }

  test("epochAlloc: small sources cap at maxEpochs, big take the share, remainder reported") {
    // source a: 10 tokens (cap 40 < share 50) ; source b: 100 tokens
    val df = Seq(("a", 10L), ("b", 100L)).toDF("src", "n")
    val r = Sampling.epochAlloc(df, "src", $"n", budget = 100L, maxEpochs = 4)
      .collect().map(x => x.getAs[String]("stratum") -> x).toMap
    assert(r("a").getAs[Long]("alloc") == 40L)
    assert(r("a").getAs[Long]("epochs_micro") == 4000000L)
    assert(r("b").getAs[Long]("alloc") == 50L)
    assert(r("b").getAs[Long]("epochs_micro") == 500000L)
    assert(r("a").getAs[Long]("unallocated") == 10L)
    // unallocated is CAP-stranded budget only: an indivisible budget's
    // integer remainder (101 div 2 -> 1 left over) must not inflate it
    val r2 = Sampling.epochAlloc(df, "src", $"n", budget = 101L, maxEpochs = 4)
      .collect().map(x => x.getAs[String]("stratum") -> x).toMap
    assert(r2("a").getAs[Long]("unallocated") == 10L)
    val bad = Seq(("a", -1L)).toDF("src", "n")
    assertThrows[Exception](
      Sampling.epochAlloc(bad, "src", $"n", budget = 10L).collect())
  }

  test("sccPivot: directed ring is the SCC, chord-reached nodes excluded, distances exact") {
    // ring 0 -> 1 -> 2 -> 0 (the pivot's SCC), chord 2 -> 5 -> 6 (one-way:
    // forward-reachable, never backward), and a disjoint ring 8 <-> 9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 5L), (5L, 6L),
      (8L, 9L), (9L, 8L)).toDF("s", "d")
    val r = Graph.sccPivot(edges, "s", "d", rounds = 4)
      .collect().map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("fw_dist"), x.getAs[Long]("bw_dist"))).toMap
    assert(r.keySet == Set(0L, 1L, 2L))
    assert(r(0L) == (0L, 0L))
    assert(r(1L) == (1L, 2L)) // forward 1 hop; backward via 2 -> 0
    assert(r(2L) == (2L, 1L))
    // a graph of only self-loops has no pivot — loud refusal, not an NPE
    val loops = Seq((3L, 3L)).toDF("s", "d")
    assertThrows[IllegalArgumentException](Graph.sccPivot(loops, "s", "d", 2))
  }

  test("sccDecompose: full decomposition matches sequential Tarjan on a seeded digraph") {
    // 120 seeded random edges over 40 nodes (density ~3): a giant SCC plus
    // satellite singletons — the trim, color, and backward-mark paths all
    // fire. Reference truth: textbook Tarjan run driver-side.
    val rnd = new scala.util.Random(1313L)
    val es = (1 to 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = Graph.sccDecompose(es.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("scc")).toMap

    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    var index = 0
    val idx = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val label = scala.collection.mutable.Map[Long, Long]()
    def strongconnect(v: Long): Unit = {
      idx(v) = index; low(v) = index; index += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Seq.empty)) {
        if (!idx.contains(w)) { strongconnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), idx(w))
      }
      if (low(v) == idx(v)) {
        val comp = scala.collection.mutable.Buffer[Long]()
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        val m = comp.min
        comp.foreach(x => label(x) = m)
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strongconnect(v))
    assert(got == label.toMap)
    // the fixture genuinely exercises a multi-node SCC
    assert(got.values.toSet.size < got.size)
    // disjoint two-cycles + a chain tail: three non-trivial SCCs + singletons
    val small = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 6L), (6L, 5L),
      (2L, 3L), (4L, 5L), (6L, 7L), (7L, 8L)).toDF("s", "d")
    val got2 = Graph.sccDecompose(small, "s", "d")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("scc")).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("Checkpoints: reliable mode is bit-identical to local mode and refuses a missing dir") {
    // the cluster-reliability knob (executor loss destroys localCheckpoint
    // blocks mid-fixpoint): same graph through sccDecompose and
    // connectedComponents in both modes must label identically
    val rnd = new scala.util.Random(77L)
    val es = (1 to 80).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edf = es.toDF("s", "d")
    val plainScc = Graph.sccDecompose(edf, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plainCc = Dedup.connectedComponents(edf, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // reliable mode without a checkpoint dir must refuse loudly, not
      // fall back to the very blocks the mode exists to avoid
      spark.conf.set(Checkpoints.ReliableConf, "true")
      try assertThrows[IllegalArgumentException](
        Graph.sccDecompose(edf, "s", "d").collect())
      finally spark.conf.unset(Checkpoints.ReliableConf)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ck_reliable")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Checkpoints.ReliableConf, "true")
    try {
      val relScc = Graph.sccDecompose(edf, "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(relScc == plainScc)
      val relCc = Dedup.connectedComponents(edf, "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(relCc == plainCc)
    } finally {
      spark.conf.unset(Checkpoints.ReliableConf)
      Residuals.release()
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("mipsTransform: completion dim equalizes norms within floor slack, max-norm vector gets 0") {
    val r = Embeddings.mipsTransform(embs, "vec_id", "embedding")
    import org.apache.spark.sql.functions.{col, expr, max => smax, sum => ssum}
    val d = 64L
    val aug = r.groupBy(col("vec_id"))
      .agg(ssum(expr("v * v")).as("aug_n2"),
        ssum(expr("CASE WHEN dim = 65 THEN v ELSE CAST(0 AS BIGINT) END")).as("extra"))
    val m2 = aug.agg(smax(expr("aug_n2 - (extra * extra)"))).collect()(0).getLong(0)
    // every augmented norm sits within the floor slack below the max:
    // m2 - aug_n2 = (m2 - n2) - floor(sqrt(m2 - n2))^2 in [0, 2*sqrt+1)
    val viol = aug.filter(expr(s"aug_n2 > $m2") ||
      expr(s"$m2 - aug_n2 > 2 * CAST(sqrt($m2) AS BIGINT) + 1")).count()
    assert(viol == 0L)
    assert(aug.filter(expr(s"aug_n2 - extra * extra = $m2"))
      .filter(col("extra") === 0L).count() >= 1L,
      "the max-norm vector must take completion 0")
  }

  test("residualQuantize: stage-2 error refines stage 1, never negative") {
    import org.apache.spark.sql.functions.{col, expr}
    val r = Embeddings.residualQuantize(embs, "vec_id", "embedding")
    assert(r.filter(col("err") < 0L).count() == 0L)
    // stage-1-only error = x - recon1 = err + recon2 >= err, so recon2 >= 0
    // and every code is an 8-bit value
    assert(r.filter(col("code1") < 0L || col("code1") > 255L
      || col("code2") < 0L || col("code2") > 255L).count() == 0L)
    // the refinement is real: total err is strictly below stage-1-only err
    val total = r.agg(expr("sum(err)")).collect()(0).getLong(0)
    val s1only = Embeddings.quantizeScalar(embs, "vec_id", "embedding")
      .agg(expr("sum(err)")).collect()(0).getLong(0)
    assert(total < s1only)
  }

  test("bmpPatches: tile geometry and means exact on a hand image") {
    // 10x10: left half luma-0 black, right half pure white -> with 8x8
    // patches the grid is 2x2 with tile sizes 64/16/16/4
    val bytes = Multimodal.bmpEncode(10, 10, (x, _) =>
      if (x < 5) (0, 0, 0) else (255, 255, 255))
    val tiles = Multimodal.bmpPatches(bytes, 8)
      .map { case (py, px, n, m) => (py, px) -> (n, m) }.toMap
    assert(tiles.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(tiles((0L, 0L))._1 == 64L && tiles((0L, 1L))._1 == 16L)
    assert(tiles((1L, 0L))._1 == 16L && tiles((1L, 1L))._1 == 4L)
    // white luma = 299+587+114 = 1000 milli; tile (0,0) is 5 black + 3
    // white columns over 8 rows: mean = 3*8*255000 / 64
    assert(tiles((0L, 1L))._2 == 255000L && tiles((1L, 1L))._2 == 255000L)
    assert(tiles((0L, 0L))._2 == 3L * 8L * 255000L / 64L)
  }

  test("wavVad: silent windows unvoiced, loud windows voiced, counts conserve samples") {
    // 128 frames mono: first 64 silent, last 64 at full-ish swing
    val samples = Array.tabulate[Short](128)(f => if (f < 64) 0 else 2000)
    val bytes = Multimodal.wavEncode(8000, 1, samples)
    val wins = Multimodal.wavVad(bytes, 64, 1330000L)
    assert(wins.length == 2)
    assert(wins(0) == (0L, 64L, 0L, 0L))
    assert(wins(1) == (1L, 64L, 64L * 2000L * 2000L, 1L))
  }

  test("withLicenseSignals: conservative precedence, case-insensitive markers") {
    val docs = Seq(
      (1L, "Shared under CREATIVE COMMONS terms. all rights reserved"),
      (2L, "See the Apache License 2.0"),
      (3L, "plain prose")).toDF("doc_id", "text")
    val r = TextAnalysis.withLicenseSignals(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // both markers present -> the stricter claim wins
    assert(r(1L).getAs[String]("license_class") == "restrictive")
    assert(r(1L).getAs[Long]("has_cc") == 1L)
    assert(r(2L).getAs[String]("license_class") == "open-permissive")
    assert(r(3L).getAs[String]("license_class") == "none")
  }

  test("withCodeSignals: planted code fires on symbols and indents, prose stays clean") {
    val docs = Seq(
      (1L, "def f(x) { return (x + 1); }\n  val y = f(2);\n  g(y);"),
      (2L, "the quick brown fox jumps over the lazy dog again and again")).toDF("doc_id", "text")
    val r = TextAnalysis.withCodeSignals(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("is_code") == 1L)
    assert(r(1L).getAs[Long]("n_indents") == 2L)
    assert(r(2L).getAs[Long]("is_code") == 0L && r(2L).getAs[Long]("n_symbols") == 0L)
  }

  test("flattenHierarchy: roots/levels exact on a forest, shallow doublings and cycles raise") {
    // two trees: 0 <- {1, 2}, 1 <- 3; and root 10 alone (self-parent form)
    val nodes = Seq((0L, Option.empty[Long]), (1L, Some(0L)), (2L, Some(0L)),
      (3L, Some(1L)), (10L, Some(10L))).toDF("id", "par")
    val r = Graph.flattenHierarchy(nodes, "id", "par", doublings = 2)
      .collect().map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("root"), x.getAs[Long]("level"))).toMap
    assert(r == Map(0L -> (0L, 0L), 1L -> (0L, 1L), 2L -> (0L, 1L),
      3L -> (0L, 2L), 10L -> (10L, 0L)))
    // a chain deeper than 2^doublings must refuse, not report a non-root
    val chain = (0L to 6L).map(i =>
      (i, if (i == 0) Option.empty[Long] else Some(i - 1))).toDF("id", "par")
    assertThrows[Exception](
      Graph.flattenHierarchy(chain, "id", "par", doublings = 1).collect())
    assert(Graph.flattenHierarchy(chain, "id", "par", doublings = 3)
      .collect().map(_.getAs[Long]("level")).max == 6L)
    // a 2-cycle never reaches a root — loud, not an infinite inflation
    val cyc = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("id", "par")
    assertThrows[Exception](
      Graph.flattenHierarchy(cyc, "id", "par", doublings = 3).collect())
    // a parent with no node row must raise, not silently drop the child
    val dangling = Seq((1L, Some(99L)), (2L, Option.empty[Long])).toDF("id", "par")
    assertThrows[Exception](
      Graph.flattenHierarchy(dangling, "id", "par", doublings = 2).collect())
  }

  test("perceptron: hand-traced rounds, ragged vectors and bad labels raise") {
    // two points: x=(1,2) y=+1, x=(1,-4) y=-1
    // r1 from w=0: both miss -> w = (1,2) + (-1,4) = (0,6); n_miss 2
    // r2: margins +12 and -(-24)=24 both > 0 -> no update; n_miss 0
    val pts = Seq((Array(1L, 2L), 1L), (Array(1L, -4L), -1L)).toDF("x", "y")
    val r = Features.perceptron(pts, $"x", $"y", rounds = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r((1L, 1L)) == (0L, 2L) && r((1L, 2L)) == (6L, 2L))
    assert(r((2L, 1L)) == (0L, 0L) && r((2L, 2L)) == (6L, 0L))
    val ragged = Seq((Array(1L, 2L), 1L), (Array(1L), -1L)).toDF("x", "y")
    assertThrows[Exception](Features.perceptron(ragged, $"x", $"y").collect())
    val badLabel = Seq((Array(1L, 2L), 7L)).toDF("x", "y")
    assertThrows[Exception](Features.perceptron(badLabel, $"x", $"y").collect())
    // empty input and NULL vectors refuse with named messages, not NPEs
    val empty = Seq.empty[(Array[Long], Long)].toDF("x", "y")
    assertThrows[IllegalArgumentException](Features.perceptron(empty, $"x", $"y"))
    val nullVec = Seq((Option.empty[Array[Long]], 1L), (Some(Array(1L, 2L)), -1L))
      .toDF("x", "y")
    assertThrows[Exception](Features.perceptron(nullVec, $"x", $"y").collect())
  }

  test("botScore: a planted metronomic single-minded burst user scores 100") {
    import java.sql.Timestamp
    // bot: 8 events exactly 1s apart, one type (zero entropy, metronomic,
    // peak 8); human: 4 events with dispersed gaps and mixed types
    val base = 1700000000000000L
    val bot = (0 until 8).map(i =>
      (1L, new Timestamp((base + i * 1000000L) / 1000), "click"))
    val human = Seq(0L, 7L, 29L, 123L).zipWithIndex.map { case (m, i) =>
      (2L, new Timestamp((base + m * 60000000L) / 1000), if (i % 2 == 0) "view" else "buy") }
    val ev = (bot ++ human).toDF("user_id", "ts", "event_type")
    val r = Behavior.botScore(ev, "user_id", "ts", "event_type",
      entropyMaxMicro = 100000L, peakMin = 5L)
      .collect().map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("bot_score")).toMap
    assert(r(1L) == 100L, r.toString)
    assert(r(2L) < 50L, r.toString)
  }

  test("quality implies and uniqueTogether: null expect is a violation, null fields compare equal") {
    val df = Seq(
      ("purchase", Some(5.0), Some(1L), "a"),
      ("purchase", None, Some(1L), "b"), // null value under a matching cond -> violation
      ("purchase", Some(-1.0), None, "a"),
      ("view", None, None, "a")) // cond false -> never a violation
      .toDF("t", "v", "k", "g")
    val res = Quality.check(df, Seq(
      Quality.implies("pos_value", $"t" === "purchase", $"v" > 0.0),
      Quality.uniqueTogether(Seq("k", "g"))))
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("violations")).toMap
    assert(res("implies(pos_value)") == 2L) // the null and the -1
    // combos: (1,a),(1,b),(null,a),(null,a) -> the two (null,a) rows ARE dups
    assert(res("unique_together(k,g)") == 1L)
    assertThrows[IllegalArgumentException](Quality.uniqueTogether(Seq("k")))
  }

  test("paretoFront: dominated points drop, axis ties survive, null signal raises") {
    // (5,10) and (10,5) are the front; (5,5) dominated by both; (3,10) is
    // dominated by (5,10) (tie on y, strict on x); (10,5) duplicated ->
    // both copies survive (full tie)
    val pts = Seq((1L, 5L, 10L), (2L, 10L, 5L), (3L, 5L, 5L), (4L, 3L, 10L),
      (5L, 10L, 5L)).toDF("id", "xx", "yy")
    val front = Sampling.paretoFront(pts, "id", $"xx", $"yy")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(front == Set(1L, 2L, 5L))
    val bad = Seq((1L, Some(5L), Option.empty[Long])).toDF("id", "xx", "yy")
    assertThrows[Exception](Sampling.paretoFront(bad, "id", $"xx", $"yy").collect())
  }

  test("coreness: h-index fixpoint equals peeled coreness on clique+tail") {
    // K5 (coreness 4) with a 3-node tail path off node 1 (coreness 1) and
    // a triangle hung off node 2 (coreness 2) — three distinct core levels
    val k5 = for (a <- 1L to 5L; b <- (a + 1L) to 5L) yield (a, b)
    val tail = Seq((1L, 10L), (10L, 11L), (11L, 12L))
    val tri = Seq((2L, 20L), (2L, 21L), (20L, 21L))
    val edges = (k5 ++ tail ++ tri).toDF("src", "dst")
    val truth = Graph.corenessByPeeling(k5 ++ tail ++ tri)
    // information radius here is tiny — 6 rounds is past the fixpoint
    val got = Graph.coreness(edges, "src", "dst", rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
    assert(got(3L) == 4L && got(12L) == 1L && got(20L) == 2L)
    // monotone non-increasing in rounds: an early cut only over-estimates
    val early = Graph.coreness(edges, "src", "dst", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.forall { case (n, c) => early(n) >= c })
  }

  test("jaccardSimilarity: path pair scores exactly, adjacent pairs excluded") {
    // path 1-2-3-4: non-adjacent (1,3) share {2}: deg 1+2-1=2 -> 500000;
    // (2,4) share {3}: deg 2+1-1=2 -> 500000; (1,4) share nothing -> absent
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.jaccardSimilarity(p, "src", "dst")
      .collect().map(x => (x.getAs[Long]("node_a"), x.getAs[Long]("node_b")) ->
        x.getAs[Long]("jac_micro")).toMap
    assert(r == Map((1L, 3L) -> 500000L, (2L, 4L) -> 500000L))
    // triangle: every pair adjacent -> no candidates at all
    val t3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.jaccardSimilarity(t3, "src", "dst").count() == 0L)
  }

  test("seqPatterns: gapped order counts, ties don't, support filters") {
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def at(s: Long) = java.sql.Timestamp.from(ts0.plusSeconds(s))
    val ev = Seq(
      (1L, "a", at(0)), (1L, "x", at(5)), (1L, "b", at(10)), // a..b with a gap
      (2L, "a", at(0)), (2L, "b", at(1)),                    // a then b adjacent
      (3L, "b", at(0)), (3L, "a", at(1)),                    // b then a (reverse)
      (4L, "a", at(7)), (4L, "b", at(7))                     // tie -> neither
    ).toDF("u", "t", "ts")
    val r = Behavior.seqPatterns(ev, "u", "t", "ts", minSupport = 1L)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n_users")).toMap
    assert(r((("a", "b"))) == 2L) // users 1 and 2; the tie user 4 does NOT count
    assert(r((("b", "a"))) == 1L) // user 3
    // support threshold prunes the singleton pattern
    val r2 = Behavior.seqPatterns(ev, "u", "t", "ts", minSupport = 2L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(r2 == Set(("a", "b")))
  }

  test("f1Sweep: confusion counts exact per threshold, NULL score refused") {
    // scores 10(y=1), 20(y=0), 30(y=1): at thr=30 tp=1 fp=0 fn=1;
    // at 20 tp=1 fp=1 fn=1; at 10 tp=2 fp=1 fn=0
    val d = Seq((10L, 1L), (20L, 0L), (30L, 1L)).toDF("s", "y")
    val r = Eval.f1Sweep(d, col("s"), col("y"))
      .collect().map(x => x.getAs[Long]("threshold") ->
        (x.getAs[Long]("tp"), x.getAs[Long]("fp"), x.getAs[Long]("fn"))).toMap
    assert(r(30L) == ((1L, 0L, 1L)) && r(20L) == ((1L, 1L, 1L)) && r(10L) == ((2L, 1L, 0L)))
    val bad = Seq((Option.empty[Long], 1L)).toDF("s", "y")
    assertThrows[Exception](Eval.f1Sweep(bad, col("s"), col("y")).collect())
  }

  test("cohenKappa: perfect agreement 1, constant labeler 0, known mixed value") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    assert(Eval.cohenKappa(perfect, col("x"), col("y")).head().getAs[Double]("kappa") == 1.0)
    // labeler y constant -> pe = po -> kappa 0 via the real formula
    val const = Seq(("a", "a"), ("b", "a"), ("a", "a")).toDF("x", "y")
    val k0 = Eval.cohenKappa(const, col("x"), col("y")).head().getAs[Double]("kappa")
    assert(k0 == 0.0)
    // textbook 2x2: n=100, agree=70, marginals 50/50 & 60/40 -> pe_n2=5000
    // kappa = (7000-5000)/(10000-5000) = 0.4
    val rows = Seq.fill(40)(("p", "p")) ++ Seq.fill(10)(("p", "n")) ++
      Seq.fill(20)(("n", "p")) ++ Seq.fill(30)(("n", "n"))
    val k = Eval.cohenKappa(rows.toDF("x", "y"), col("x"), col("y")).head()
    assert(k.getAs[Long]("n") == 100L && k.getAs[Long]("agree_n") == 70L)
    assert(k.getAs[Double]("kappa") == 0.4)
  }

  test("topkChurn: entries, exits and rank moves all surface; absents are 0") {
    val o = Seq(("a", 30L), ("b", 20L), ("c", 10L), ("d", 1L)).toDF("k", "w")
    val n = Seq(("a", 10L), ("b", 40L), ("z", 30L), ("d", 1L)).toDF("k", "w")
    val r = Drift.topkChurn(o, n, "k", "w", k = 3)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("rank_old"), x.getAs[Long]("rank_new"))).toMap
    assert(r("a") == ((1L, 3L)))  // demoted
    assert(r("b") == ((2L, 1L)))  // promoted
    assert(r("c") == ((3L, 0L)))  // exited the head
    assert(r("z") == ((0L, 2L)))  // entered the head
    assert(!r.contains("d"))      // never in either top-3
  }

  test("conflictingRecords: metadata disagreement surfaces, null is a value") {
    val d = Seq((1L, "h1", Some("en")), (2L, "h1", Some("de")),
      (3L, "h2", Some("en")), (4L, "h2", Some("en")),
      (5L, "h3", Some("en")), (6L, "h3", None)).toDF("id", "h", "lang")
    val r = Quality.conflictingRecords(d, col("h"), col("lang"))
      .collect().map(x => x.getString(0) -> x.getAs[String]("values")).toMap
    assert(r("h1") == "de,en")        // sorted attribute list
    assert(r("h3") == " null,en")     // tagged-vs-untagged IS a conflict
    assert(!r.contains("h2"))         // agreement is not
  }

  test("garbageSignals: three failure modes flag, clean prose and CJK don't") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "一些中文文本 没有拉丁字母 也不是垃圾"), // CJK: alnum high via \p{L}
      (3L, "xq3f9b7c1d4e5f60718293a4b5c6d7e8f90a1b2c3d4e5f6a ok"), // 49-char token
      (4L, "zxcv qwrt plmk bnmv hjkl dfgh"), // all-consonant latin words
      (5L, "#?*! #?*! #?*! #?*! #?*! #?*! #?*! #?*!")) // symbol storm
      .toDF("doc_id", "text")
    val r = TextAnalysis.garbageSignals(d, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("is_garbage")).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("spearman: monotone 1, reversed -1, tie-broken ranks deterministic") {
    val up = (1L to 9L).map(i => (i, i * 10L, i * i)).toDF("id", "a", "b")
    assert(Features.spearman(up, "id", "a", "b").head().getAs[Double]("rho") == 1.0)
    val down = (1L to 9L).map(i => (i, i, 100L - i)).toDF("id", "a", "b")
    assert(Features.spearman(down, "id", "a", "b").head().getAs[Double]("rho") == -1.0)
    val dup = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 7L, 7L)).toDF("id", "a", "b")
    // duplicate values rank by id on BOTH axes -> still perfectly aligned
    assert(Features.spearman(dup, "id", "a", "b").head().getAs[Double]("rho") == 1.0)
  }

  test("werAudit: subs/dels/inserts count once each, empty edges, exact micro rates") {
    val pairs = Seq(
      (1L, "a b c", "a b c"),   // identical: 0 edits
      (2L, "a x c", "a b c"),   // one substitution
      (3L, "b c", "a b c"),     // one deletion
      (4L, "a q c d", "a b c"), // substitution + insertion = 2
      (5L, "", "a b c"),        // empty cand tokenizes to [''] -> dist 3
      (6L, "x y", "")           // empty ref -> ref_len 1, ref_chars 0 (floored)
    ).toDF("id", "cand", "ref")
    val r = Eval.werAudit(pairs, "id", "cand", "ref")
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("dist"), x.getAs[Long]("wer_micro"), x.getAs[Long]("cer_micro"))).toMap
    assert(r(1L) == ((0L, 0L, 0L)))
    assert(r(2L)._1 == 1L && r(2L)._2 == 333333L)
    assert(r(3L)._1 == 1L)
    assert(r(4L)._1 == 2L && r(4L)._2 == 666666L)
    assert(r(5L)._1 == 3L && r(5L)._2 == 1000000L)
    assert(r(6L)._1 == 2L && r(6L)._2 == 2000000L && r(6L)._3 == 3000000L)
  }

  test("quantileNorm: uniform grid, ties id-broken, micro quantiles exact") {
    val d = (1L to 9L).map(i => (i, i * 100L)).toDF("id", "v")
    val r = Features.quantileNorm(d, "id", "v").orderBy(col("id"))
      .collect().map(_.getAs[Long]("qnorm_micro")).toSeq
    // n = 9: quantile of rank i is i/10 exactly
    assert(r == (1L to 9L).map(_ * 100000L))
    val ties = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "v")
    val t = Features.quantileNorm(ties, "id", "v").orderBy(col("id"))
      .collect().map(x => (x.getAs[Long]("id"), x.getAs[Long]("rank"))).toSeq
    assert(t == Seq((1L, 1L), (2L, 2L), (3L, 3L)), "equal values rank by id")
  }

  test("Ranks: distributed globalRank/rankBucket == global row_number/ntile") {
    import org.apache.spark.sql.expressions.Window
    // ties-heavy frame across many partitions: 400 rows, 13 distinct
    // values, unique tie key — the exact shape whose global window the
    // decomposition replaces
    val df = spark.range(400).select(
      col("id"), (col("id") * 37L % 13L).as("v")).repartition(8)
    val viaWindow = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("bk",
        (ntile(7).over(Window.orderBy(col("v"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("rk"), col("bk"))
    val viaRanks = Ranks.rankBucket(
        Ranks.globalRank(df, "v", Seq("id"), "rk", "n"),
        "v", Seq("id"), 7, "bk")
      .select(col("id"), col("rk"), col("bk"))
    assert(viaRanks.except(viaWindow).isEmpty && viaWindow.except(viaRanks).isEmpty,
      "distributed rank decomposition must be bit-identical to the global window")
    // n < buckets: every row alone in its own ntile bucket, no ANSI division
    val tiny = spark.range(3).select(col("id"), col("id").as("v"))
    val tb = Ranks.rankBucket(tiny, "v", Seq("id"), 7, "bk")
      .orderBy(col("id")).collect().map(_.getAs[Long]("bk")).toSeq
    assert(tb == Seq(0L, 1L, 2L))
  }

  test("Ranks.pairRanks: fused dual ranking == two global windows") {
    import org.apache.spark.sql.expressions.Window
    // ties in BOTH columns, different domains per branch
    val df = spark.range(400).select(col("id"),
      (col("id") * 37L % 13L).as("a"), (col("id") * 29L % 7L).as("b"))
      .repartition(8)
    val viaWindow = df
      .withColumn("ra", row_number().over(
        Window.orderBy(col("a"), col("id"))).cast("long"))
      .withColumn("rb", row_number().over(
        Window.orderBy(col("b"), col("id"))).cast("long"))
      .select(col("id"), col("ra"), col("rb"))
    val viaPair = Ranks.pairRanks(df, "id", "a", "b", "ra", "rb")
      .select(col("id"), col("ra"), col("rb"))
    assert(viaPair.except(viaWindow).isEmpty && viaWindow.except(viaPair).isEmpty,
      "fused pair ranking must be bit-identical to the two global windows")
  }

  test("Ranks: NULL value and oversized value domain refuse loudly") {
    // NULL value: the offsets join would silently drop the row and the
    // NULL rank position diverges across engines — must raise, not drop
    val withNull = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "v")
    assert(foldRefusal(Ranks.globalRank(withNull, "v", Seq("id"), "rk", "n"))
      .contains("NULL in value column"))
    assert(foldRefusal(Ranks.pairRanks(
        withNull.withColumn("w", col("id")), "id", "v", "w", "ra", "rb"))
      .contains("NULL in value column"))
    // near-unique domain: the cumulative-offset window would be data-sized
    // — the guard rides the plan and names the remedy
    val unique = spark.range(100).select(col("id"), col("id").as("v"))
    val msg = foldRefusal(Ranks.globalRank(unique, "v", Seq("id"), "rk", "n",
      maxDomain = 50L))
    assert(msg.contains("maxDomain") && msg.contains("quantize"))
    assert(foldRefusal(Ranks.pairRanks(
        unique.withColumn("w", col("id") % 3L), "id", "v", "w", "ra", "rb",
        maxDomain = 50L))
      .contains("maxDomain"))
    // at the cap exactly: no refusal
    val ok = Ranks.globalRank(unique, "v", Seq("id"), "rk", "n",
      maxDomain = 100L).count()
    assert(ok == 100L)
  }

  test("miTerms: a lang-exclusive token outranks a uniform one") {
    val d = Seq(
      (1L, "en", "hello shared"), (2L, "en", "hello shared"),
      (3L, "de", "hallo shared"), (4L, "de", "hallo shared"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.miTerms(d, "doc_id", "lang", "text", topK = 2)
      .filter(col("lang") === "en").orderBy(col("mi_scaled").desc)
      .collect().map(x => x.getAs[String]("token") -> x.getAs[Long]("mi_scaled"))
    assert(r.head._1 == "hello" && r.head._2 > 0L)
    // the everywhere-token carries zero information
    assert(r.find(_._1 == "shared").forall(_._2 <= 0L))
  }

  test("shardBySize: within every band the shard deal is balanced to one doc") {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val docs = (0L until 97L).map(i => (i, (i * 37L) % 500L)).toDF("id", "sz")
    val a = Batching.shardBySize(docs, "id", col("sz"), nShards = 4, bands = 4)
    assert(a.count() == 97L)
    val spread = a.groupBy(col("band"), col("shard")).agg(count(lit(1)).as("n"))
      .groupBy(col("band")).agg((max(col("n")) - min(col("n"))).as("d"))
      .collect()
    assert(spread.nonEmpty && spread.forall(_.getAs[Long]("d") <= 1L),
      "round-robin within a band must balance shard counts to within one")
    assert(a.select(col("shard")).distinct().count() == 4L)
  }

  test("silhouette: real clustering scores positive; moments match brute force") {
    // the embeddings fixture under the 8-cell Voronoi partition: whatever
    // the cells look like, the moment-based per-cell sums must equal the
    // O(n²) brute-force silhouette on a small slice
    val slice = embs.limit(60).cache()
    val r = Eval.silhouette(slice, "vec_id", "embedding", cells = 4)
      .collect().map(x => x.getAs[Long]("cell") ->
        (x.getAs[Long]("n_points"), x.getAs[Long]("sum_s_nano"))).toMap
    assert(r.values.map(_._1).sum == 60L, "every point scored exactly once")
    // brute force on the same assignment (argmax dot against the public
    // md5 centroid weights — cellOf is operator-internal) and the same
    // milli quantization
    val weights = Array.tabulate(4, 64)((c, d) => Similarity.centroidWeight(42L, c, d))
    val qm = slice.select($"vec_id",
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").as("qm"),
      VectorFns.quantize($"embedding").as("qv"))
    val assigned = qm.select($"vec_id", $"qm", $"qv").collect()
      .map { x =>
        val qv = x.getSeq[Long](2).toArray
        val cell = (0 until 4)
          .map(c => c -> (0 until 64).map(d => weights(c)(d) * qv(d)).sum)
          .minBy { case (c, dot) => (-dot, c) }._1.toLong
        (x.getLong(0), cell, x.getSeq[Long](1).toArray)
      }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val brute = assigned.map { case (_, c, v) =>
      // a over own cell INCLUDING identical-vector twins (they differ by id)
      val ownAll = assigned.filter(_._2 == c)
      val a =
        if (ownAll.length == 1) 0.0
        else ownAll.map(p => d2(p._3, v)).sum.toDouble / (ownAll.length - 1).toDouble
      val others = assigned.groupBy(_._2).filter(_._1 != c)
      if (others.isEmpty) c -> 0L
      else {
        val b = others.values.map(g => g.map(p => d2(p._3, v)).sum.toDouble / g.length).min
        val s = if (ownAll.length == 1 || math.max(a, b) == 0.0) 0.0
                else (b - a) / math.max(a, b)
        c -> math.floor(s * 1e9 + 0.5).toLong
      }
    }
    val bruteSums = brute.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    bruteSums.foreach { case (c, sum) =>
      assert(r(c)._2 == sum, s"cell $c: moment path ${r(c)._2} vs brute $sum")
    }
  }

  test("nbLangConfusion: separable vocabularies classify diagonally") {
    val train = Seq(
      (0L, "en", "the cat sat on the mat"), (2L, "en", "the dog ate the food"),
      (4L, "ru", "кот сидел на ковре"), (6L, "ru", "собака ела еду")
    ).toDF("doc_id", "lang", "text")
    val test = Seq(
      (1L, "en", "the cat ate"), (3L, "ru", "кот ела на")
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.nbLangConfusion(train, test, "doc_id", "lang", "text")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("en", "en") -> 1L, ("ru", "ru") -> 1L))
  }

  test("growthAccounting: ledger identities hold; lifecycle states classify") {
    val ts0 = java.time.Instant.parse("2024-01-04T00:00:00Z")
    def wk(w: Long) = java.sql.Timestamp.from(ts0.plusSeconds(w * 604800L))
    // u1: w0,w1,w2 (new, retained, retained); u2: w0, gap, w2 (new, churn@1, resurrected)
    // u3: w1 only (new@1, churn@2)
    val ev = Seq(
      (1L, wk(0)), (1L, wk(1)), (1L, wk(2)),
      (2L, wk(0)), (2L, wk(2)),
      (3L, wk(1))
    ).toDF("user_id", "ts")
    val r = Behavior.growthAccounting(ev, "user_id", "ts")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap.map { case (w, t) => (w - ev.select(expr("min(unix_micros(ts) div 604800000000)")).head().getLong(0)) -> t }
    // (n_active, n_new, n_retained, n_resurrected, n_churned)
    assert(r(0L) == ((2L, 2L, 0L, 0L, 0L)))
    assert(r(1L) == ((2L, 1L, 1L, 0L, 1L)))   // u3 new, u1 retained, u2 churned
    assert(r(2L) == ((2L, 0L, 1L, 1L, 1L)))   // u1 retained, u2 resurrected, u3 churned
    r.foreach { case (w, (act, nw, ret, res, _)) =>
      assert(act == nw + ret + res, s"week $w: active != new+retained+resurrected") }
    // retained(w) + churned(w) == active(w-1)
    assert(r(1L)._3 + r(1L)._5 == r(0L)._1)
    assert(r(2L)._3 + r(2L)._5 == r(1L)._1)
  }

  /** The hourly-fold span cap now refuses FROM the fold task (fused guard,
    * r15 verdict #3), so the IllegalArgumentException arrives as the CAUSE
    * of a SparkException when an action runs — this forces the plan and
    * returns the whole cause-chain message text for the loud-refusal
    * assertions. */
  private def foldRefusal(df: => org.apache.spark.sql.DataFrame): String = {
    val ex = intercept[Throwable](df.collect())
    Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
  }

  test("cusumShift: sustained surge/outage accumulate to signed flags, constant stays silent") {
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def hr(h: Long, i: Int) = java.sql.Timestamp.from(ts0.plusSeconds(h * 3600L + i))
    def blk(t: String, h: Long, n: Int) = (0 until n).map(i => (t, hr(h, i)))
    val h0 = ts0.getEpochSecond / 3600
    val ev = (
      (0L to 23L).flatMap(h => blk("steady", h, 10)) ++
      // surge: mu = 15, accrual (40 - 18.75)k/hr crosses h = 60k in hour 3
      (0L to 19L).flatMap(h => blk("surgy", h, 10)) ++
      (20L to 23L).flatMap(h => blk("surgy", h, 40)) ++
      // outage: 12 h at 10 then 12 dark hours -> mu = 5, S- crosses 20k
      (0L to 11L).flatMap(h => blk("dark", h, 10)) ++ blk("dark", 23L, 1)
    ).toDF("event_type", "ts")
    val r = Behavior.cusumShift(ev, "event_type", "ts")
      .collect().map(x => (x.getString(0), x.getAs[Long]("hr") - h0) -> x.getAs[Long]("flag")).toMap
    (0L to 23L).foreach(h => assert(r(("steady", h)) == 0L))
    assert(r(("surgy", 23L)) == 1L, "the accumulated surge must flag +1")
    assert(r(("surgy", 5L)) == 0L, "pre-shift hours stay silent")
    assert((12L to 22L).exists(h => r(("dark", h)) == -1L),
      "the sustained outage must flag -1 somewhere in the dark stretch")
    assert(foldRefusal(Behavior.cusumShift(ev, "event_type", "ts", maxGridRows = 8))
      .contains("maxGridRows"))
  }

  test("burstDetect: burst block labeled as one interval, constant series all-base, cap refuses") {
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def hr(h: Long, i: Int) = java.sql.Timestamp.from(ts0.plusSeconds(h * 3600L + i))
    def blk(t: String, h: Long, n: Int) = (0 until n).map(i => (t, hr(h, i)))
    val h0 = ts0.getEpochSecond / 3600
    // 'bursty': 5/hr for 10 hours, then 40/hr for 4 hours, then 5/hr again
    val ev = (
      (0L to 9L).flatMap(h => blk("bursty", h, 5)) ++
      (10L to 13L).flatMap(h => blk("bursty", h, 40)) ++
      (14L to 23L).flatMap(h => blk("bursty", h, 5)) ++
      (0L to 23L).flatMap(h => blk("steady", h, 10))
    ).toDF("event_type", "ts")
    val r = Behavior.burstDetect(ev, "event_type", "ts")
      .collect().map(x => (x.getString(0), x.getAs[Long]("hr") - h0) -> x.getAs[Long]("state")).toMap
    (0L to 23L).foreach(h => assert(r(("steady", h)) == 0L, s"steady hour $h"))
    (10L to 13L).foreach(h => assert(r(("bursty", h)) == 1L, s"burst hour $h must label 1"))
    ((0L to 9L) ++ (14L to 23L)).foreach(h =>
      assert(r(("bursty", h)) == 0L, s"base hour $h must label 0"))
    assert(foldRefusal(Behavior.burstDetect(ev, "event_type", "ts", maxGridRows = 8))
      .contains("maxGridRows"))
  }

  test("ewmaAnomaly: constant series never flags; spike +1, outage -1; gaps decay") {
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def hr(h: Long, i: Int) = java.sql.Timestamp.from(ts0.plusSeconds(h * 3600L + i))
    def burst(t: String, h: Long, n: Int) = (0 until n).map(i => (t, hr(h, i)))
    val ev = (
      (0L to 7L).flatMap(h => burst("steady", h, 10)) ++
      (0L to 5L).flatMap(h => burst("spiky", h, 10)) ++ burst("spiky", 6L, 50) ++
      (0L to 5L).flatMap(h => burst("gone", h, 10))  ++ burst("gone", 7L, 10)
    ).toDF("event_type", "ts")
    val r = Behavior.ewmaAnomaly(ev, "event_type", "ts")
    val steady = r.filter($"event_type" === "steady").collect()
    assert(steady.forall(_.getAs[Long]("flag") == 0L))
    assert(steady.forall(_.getAs[Long]("ewma_milli") == 10000L))
    val spike = r.filter($"event_type" === "spiky" && $"hr" === (ts0.getEpochSecond / 3600 + 6))
      .head()
    assert(spike.getAs[Long]("flag") == 1L, "5x surge must flag +1")
    // hour 6 is a zero-count gap for 'gone': 0 < baseline/2 -> -1
    val outage = r.filter($"event_type" === "gone" && $"hr" === (ts0.getEpochSecond / 3600 + 6))
      .head()
    assert(outage.getAs[Long]("n") == 0L && outage.getAs[Long]("flag") == -1L,
      "missing hour is a real zero and flags as a drop")
    // and the baseline decayed through the gap: hour 7's prev < 10000
    val after = r.filter($"event_type" === "gone" && $"hr" === (ts0.getEpochSecond / 3600 + 7))
      .head()
    assert(after.getAs[Long]("ewma_prev_milli") == 7000L, "one zero hour decays 10000 -> 7000")
    // the per-type dense span is CAPPED (loud-refusal convention): two
    // types spanning > 8 dense hours each overflow maxGridRows = 8 even
    // though the sparse aggregate is only 4 rows — both bounds must hold
    val wide = Seq(
      ("a", java.sql.Timestamp.from(ts0)),
      ("a", java.sql.Timestamp.from(ts0.plusSeconds(3600L * 50))),
      ("b", java.sql.Timestamp.from(ts0)),
      ("b", java.sql.Timestamp.from(ts0.plusSeconds(3600L * 50)))).toDF("event_type", "ts")
    assert(foldRefusal(Behavior.ewmaAnomaly(wide, "event_type", "ts", maxGridRows = 8))
      .contains("maxGridRows"))
  }

  test("hourly folds scale per TYPE, not per corpus: wide type fan-out under a tiny per-type cap") {
    // r14 verdict #4: the driver-era cap bounded the GLOBAL grid, so a
    // high-cardinality-type corpus refused even though every individual
    // series was tiny. The executor fold's cap is per type: 40 types x 5
    // dense hours = 200 grid rows total sails under maxGridRows = 8
    // because no single type spans more than 5 — and the fold happens in
    // executor tasks (a MapGroups node in the plan), with no driver grid.
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val ev = (0 until 40).flatMap { t =>
      (0L to 4L).map(h => (s"type_$t", java.sql.Timestamp.from(ts0.plusSeconds(h * 3600L))))
    }.toDF("event_type", "ts")
    for ((nm, df) <- Seq(
        "ewma" -> Behavior.ewmaAnomaly(ev, "event_type", "ts", maxGridRows = 8),
        "cusum" -> Behavior.cusumShift(ev, "event_type", "ts", maxGridRows = 8),
        "burst" -> Behavior.burstDetect(ev, "event_type", "ts", maxGridRows = 8))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("MapGroups"), s"$nm must fold in executors:\n$p")
      assert(!p.contains("CollectLimit"), s"$nm must not carry the old bounded-collect shape:\n$p")
      assert(df.count() == 200L, s"$nm: 40 types x 5 dense hours")
    }
    // ...and one 9-hour type among them still refuses loudly, by name
    val ev2 = ev.union(Seq(("wide_one", java.sql.Timestamp.from(ts0)),
      ("wide_one", java.sql.Timestamp.from(ts0.plusSeconds(8L * 3600L))))
      .toDF("event_type", "ts"))
    val msg = foldRefusal(Behavior.cusumShift(ev2, "event_type", "ts", maxGridRows = 8))
    assert(msg.contains("wide_one") && msg.contains("maxGridRows"))
  }

  test("wasserstein1d: identity = 0, constant shift = exactly k, overflow refused") {
    val base = (1L to 200L).toDF("v")
    assert(Drift.wasserstein1d(base, base, "v").head().getAs[Long]("w1_num") == 0L)
    // shifting every value by k moves exactly k units of mass per point
    val shifted = (1L to 200L).map(_ + 7L).toDF("v")
    val r = Drift.wasserstein1d(base, shifted, "v").head()
    assert(r.getAs[Double]("w1") == 7.0d, s"constant shift is exact: $r")
    // n1*n2*range near 2^63 refuses loudly instead of wrapping
    val wide = Seq(0L, Long.MaxValue / 2).toDF("v")
    val big = (1L to 100000L).toDF("v")
    assertThrows[IllegalArgumentException](Drift.wasserstein1d(big, wide, "v"))
  }

  test("bleuComponents: identity scores exactly 1, disjoint corpora null-poison log-BLEU") {
    val same = Seq((1L, "a b c d e f", "a b c d e f")).toDF("id", "c", "r")
    val r = Eval.bleuComponents(same, "id", "c", "r").collect()
    assert(r.length == 4)
    r.foreach { x =>
      assert(x.getAs[Long]("p_micro") == 1000000L)
      assert(x.getAs[Long]("bp_micro") == 0L)
      assert(x.getAs[Long]("bleu_log_micro") == 0L, "log BLEU of identity is exactly 0")
    }
    // shorter candidate: brevity penalty strictly negative
    val short = Seq((1L, "a b c", "a b c d e f")).toDF("id", "c", "r")
    assert(Eval.bleuComponents(short, "id", "c", "r").collect()
      .forall(_.getAs[Long]("bp_micro") < 0L))
    // no shared 4-gram anywhere -> that n has 0 matches -> log undefined
    val disj = Seq((1L, "a b c d", "x y z w")).toDF("id", "c", "r")
    assert(Eval.bleuComponents(disj, "id", "c", "r").collect()
      .forall(x => x.isNullAt(x.fieldIndex("bleu_log_micro"))))
  }

  test("neymanAlloc: variance-weighted split sums exactly to n, constant strata weigh 0") {
    import org.apache.spark.sql.functions.col
    // stratum a: constant (sigma 0 -> weight 0); b: spread 0/10 over 4 rows
    // N*Sx2 - Sx^2 = 4*200 - 400 = 400 -> w = 20; c: spread 0/20
    // -> 4*800 - 1600 = 1600 -> w = 40
    val d = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L),
      ("b", 0L), ("b", 10L), ("b", 0L), ("b", 10L),
      ("c", 0L), ("c", 20L), ("c", 0L), ("c", 20L)).toDF("s", "x")
    val r = Sampling.neymanAlloc(d, "s", col("x"), n = 9L)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r("a") == ((0L, 0L)), "zero-variance stratum allocates nothing")
    assert(r("b") == ((20L, 3L)) && r("c") == ((40L, 6L)), s"2:1 weights: $r")
    assert(r.values.map(_._2).sum == 9L, "largest-remainder rounding sums exactly to n")
    // every stratum constant: proportional-by-count fallback
    val const = Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("s", "x")
    val f = Sampling.neymanAlloc(const, "s", col("x"), n = 3L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(f == Map("a" -> 2L, "b" -> 1L), s"proportional fallback: $f")
  }

  test("benford: digit binning by leading digit, nonpositives excluded, literal expectations") {
    import org.apache.spark.sql.functions.col
    // 1, 19, 23, 34, 999: digits 1x2, 2x1, 3x1, 9x1; 0 and -7 excluded
    val d = Seq(1L, 19L, 23L, 34L, 999L, 0L, -7L).toDF("v")
    val r = Quality.benford(d, col("v"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 9L))
    assert(r(1L)._1 == 2L && r(2L)._1 == 1L && r(9L)._1 == 1L)
    assert(r.values.forall(_._2 == 5L), "n_pos excludes the 0 and the negative")
    assert(r(1L)._3 == 400000L && r(2L)._3 == 200000L, "exact decomposed shares")
    assert(r(1L)._4 == 301030L, "Benford expectation is the literal table")
  }

  test("brierScore: perfect scorer 0, anti-scorer 1, constant-half exactly 0.25") {
    import org.apache.spark.sql.functions.{col, lit}
    val perfect = Seq((1000000L, 1L), (0L, 0L), (1000000L, 1L)).toDF("p", "y")
    assert(Eval.brierScore(perfect, col("p"), col("y")).head().getDouble(2) == 0.0d)
    val anti = Seq((0L, 1L), (1000000L, 0L)).toDF("p", "y")
    assert(Eval.brierScore(anti, col("p"), col("y")).head().getDouble(2) == 1.0d)
    val half = Seq((500000L, 1L), (500000L, 0L)).toDF("p", "y")
    val r = Eval.brierScore(half, col("p"), col("y")).head()
    assert(r.getDouble(2) == 0.25d, s"constant 0.5 scores exactly 1/4: $r")
    // out-of-range scores clamp rather than poison the sum
    val wild = Seq((5000000L, 1L)).toDF("p", "y")
    assert(Eval.brierScore(wild, col("p"), col("y")).head().getLong(1) == 0L)
  }

  test("bmpLaplacian: flat image scores exactly zero, checkerboard maximal, linear ramp zero") {
    // constant color: every Laplacian response is exactly 0
    val flat = Multimodal.bmpLaplacian(Multimodal.bmpEncode(10, 10, (_, _) => (90, 90, 90)))
    assert(flat == ((10L, 10L, 64L, 0L, 0L)))
    // a LINEAR ramp also nulls the second derivative — the degenerate case
    // that fooled the pHash fixtures (r10 lesson) is exactly a blur here
    val ramp = Multimodal.bmpLaplacian(Multimodal.bmpEncode(10, 10, (x, y) => {
      val v = 10 * x + 5 * y; (v, v, v)
    }))
    assert(ramp._4 == 0L && ramp._5 == 0L, s"linear ramp has zero Laplacian: $ramp")
    // checkerboard: interior |lap| = 4 * full luma (white centers +4L
    // against black neighbors, black centers -4L), so sums cancel and
    // squares are maximal
    val check = Multimodal.bmpLaplacian(Multimodal.bmpEncode(10, 10, (x, y) =>
      if ((x + y) % 2 == 0) (255, 255, 255) else (0, 0, 0)))
    val full = 255000L * 4
    assert(check._3 == 64L && check._4 == 0L && check._5 == 64L * full * full,
      s"checkerboard is the maximal-contrast fixture: $check")
  }

  test("coverageSelect: greedy picks by marginal gain, ties to smaller id, stops when dry") {
    val d = Seq(
      (1L, "a b c d e"),  // 5 new tokens — picked first
      (2L, "a b c"),      // fully covered after pick 1
      (3L, "a b x y"),    // gain 2 after pick 1
      (4L, "x y"),        // covered after pick 2
      (5L, "z z z")       // gain 1
    ).toDF("doc_id", "text")
    val r = Sampling.coverageSelect(d, "doc_id", "text", k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 1L, 5L, 5L), (2L, 3L, 2L, 7L), (3L, 5L, 1L, 8L)),
      s"greedy trajectory: ${r.toSeq} — stops once every remaining doc is covered")
  }

  test("bigramKneserNey: hand-computed probabilities exact, seen mass telescopes to 1") {
    // corpus "a a b a b b": c12 = {aa:1, ab:2, ba:1, bb:1}, c1 = {a:3, b:2},
    // N1+(a.) = N1+(b.) = 2, N1+(.a) = N1+(.b) = 2, Ncc = 4
    val d = Seq((1L, "a a b a b b")).toDF("doc_id", "text")
    val m = TextAnalysis.bigramKneserNey(d, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    assert(m(("a", "a")) == 333333L) // (1*4 + 12)e6 div 48
    assert(m(("a", "b")) == 666666L) // (5*4 + 12)e6 div 48
    assert(m(("b", "a")) == 500000L) // (1*4 + 12)e6 div 32
    assert(m(("b", "b")) == 500000L)
    // every continuation seen for both heads => per-head seen mass
    // telescopes to exactly 1 within truncation slack (< 1 micro per term)
    assert(m(("a", "a")) + m(("a", "b")) >= 999998L)
    assert(m(("b", "a")) + m(("b", "b")) >= 999998L)
  }

  test("rougeL: textbook LCS values, order sensitivity, subsequence saturates precision") {
    val d = Seq(
      (1L, "a b c d", "a b c d"),          // identity: lcs = 4, F = 1
      (2L, "d c b a", "a b c d"),          // reversal: lcs = 1
      (3L, "a c", "a b c d"),              // subsequence: lcs = |cand| = 2
      (4L, "x y z", "a b c d")             // disjoint: lcs = 0
    ).toDF("id", "c", "r")
    val m = Eval.rougeL(d, "id", "c", "r")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getAs[Long]("rouge_l_micro"))).toMap
    assert(m(1L) == ((4L, 1000000L)))
    assert(m(2L) == ((1L, 2L * 1000000 / 8)))
    assert(m(3L) == ((2L, 2L * 2 * 1000000 / 6)))
    assert(m(4L) == ((0L, 0L)))
  }

  test("chrfComponents: identity scores exactly 1; whitespace never counts") {
    val same = Seq((1L, "ab  cd", "ab cd")).toDF("id", "c", "r") // ws-insensitive
    val r = Eval.chrfComponents(same, "id", "c", "r", maxN = 4).collect()
    assert(r.length == 4)
    r.foreach(x => assert(x.getAs[Long]("chrf_micro") == 1000000L))
    // a strict-substring candidate: every candidate gram matches (P = 1) so
    // chrf = 5m/(4tr + tc) with m = tc
    val sub = Seq((1L, "abcd", "abcdef")).toDF("id", "c", "r")
    val s1 = Eval.chrfComponents(sub, "id", "c", "r", maxN = 1).head()
    assert(s1.getAs[Long]("matches") == 4L && s1.getAs[Long]("cand_total") == 4L)
    assert(s1.getAs[Long]("chrf_micro") == 5L * 4 * 1000000 / (4 * 6 + 4))
  }

  test("dupNgramChars: full repetition = 1000 permille, distinct = 0, overlaps never double-count") {
    val d = Seq(
      (1L, "a b c a b c"),          // trigram "a b c" twice: all 6 tokens covered
      (2L, "q w e r t y"),          // no duplicate trigram
      (3L, "x x x x"),              // "x x x" at positions 0 and 1 OVERLAP: union = 4 tokens
      (4L, "a b")                   // shorter than n: zero, not an error
    ).toDF("doc_id", "text")
    val r = TextAnalysis.dupNgramChars(d, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("dup_chars"), x.getAs[Long]("dup_permille"))).toMap
    assert(r(1L) == ((6L, 1000L)))
    assert(r(2L) == ((0L, 0L)))
    assert(r(3L) == ((4L, 1000L)), "overlapping duplicate grams cover the union, once")
    assert(r(4L) == ((0L, 0L)))
  }

  test("randomWalks: every step follows an edge, walks are deterministic and full-length") {
    val e = (0L until 30L).flatMap(k => Seq((k, (k + 1) % 30), (k, (k + 2) % 30))).toDF("s", "d")
    val w1 = Graph.randomWalks(e, "s", "d", walkLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val w2 = Graph.randomWalks(e, "s", "d", walkLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(w1.toSeq == w2.toSeq, "hash-drawn walks are reproducible")
    assert(w1.length == 30 * 5, "no dead ends on a cycle graph: every walk runs full length")
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byWalk = w1.groupBy(_._1)
    byWalk.values.foreach { steps =>
      steps.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(edges.contains((a._3, b._3)),
          s"step ${b._2} of walk ${b._1} must follow an edge")
        case _ => ()
      }
    }
    // a different seed changes at least one walk on this graph
    val w3 = Graph.randomWalks(e, "s", "d", walkLen = 4, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(w3.toSeq != w1.toSeq)
  }

  test("kTruss: K4 survives 4-truss with pendant peeled, 5-truss empties it, stars dissolve") {
    // K4 over {1,2,3,4} (every edge in exactly 2 triangles) + pendant 4-9
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 9L))
      .toDF("s", "d")
    val t4 = Graph.kTruss(k4, "s", "d", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(t4.values.forall(_ == 2L), s"every K4 edge sits in exactly 2 triangles: $t4")
    assert(Graph.kTruss(k4, "s", "d", k = 5, rounds = 2).isEmpty,
      "K4 cannot satisfy support >= 3")
    // a star has high degrees but zero triangles: any truss dissolves it
    val star = (2L to 8L).map(v => (1L, v)).toDF("s", "d")
    assert(Graph.kTruss(star, "s", "d", k = 3, rounds = 1).isEmpty)
  }

  test("shortestPaths: cheap 2-hop beats expensive 1-hop, parallel edges take min, negatives refuse") {
    // 1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 1 + 2 = 3
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L),
      (1L, 2L, 5L) /* parallel edge, heavier */).toDF("s", "d", "w")
    val r = Graph.shortestPaths(e, "s", "d", "w", Seq(1L).toDF("k"), "k", rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 3L), s"weighted relaxation: $r")
    val neg = Seq((1L, 2L, -1L)).toDF("s", "d", "w")
    assertThrows[IllegalArgumentException](
      Graph.shortestPaths(neg, "s", "d", "w", Seq(1L).toDF("k"), "k", 2))
  }

  test("betweennessSeeds: path-graph centrality exact; diamond splits sigma") {
    // symmetrized path 1-2-3-4-5, all nodes seeded: sigma = 1 everywhere so
    // bc(v) = 1e6 x (ordered source/target pairs with v interior)
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (p ++ p.map(_.swap)).toDF("a", "b")
    val seeds = (1L to 5L).toDF("k")
    val bc = Graph.betweennessSeeds(sym, "a", "b", seeds, "k", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bc(3L) == 8000000L)
    assert(bc(2L) == 6000000L && bc(4L) == 6000000L)
    assert(bc(1L) == 0L && bc(5L) == 0L)
    // diamond 1->{2,3}->4: sigma(4) = 2, so delta_1(2) = 1*(1e6+0) div 2
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val bd = Graph.betweennessSeeds(dia, "a", "b", Seq(1L).toDF("k"), "k", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bd(2L) == 500000L && bd(3L) == 500000L, s"sigma split: $bd")
    assert(bd(4L) == 0L)
  }

  test("harmonicCloseness: path-graph terms exact; disconnection contributes 0") {
    // path 1-2-3-4-5 plus isolated pair 10-11; seed at node 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("k")
    val r = Graph.harmonicCloseness(e, "src", "dst", seeds, "k", rounds = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // from 1: dists 1,2,3,4 -> 1e6 + 500000 + 333333 + 250000
    assert(r(1L) == ((4L, 2083333L)))
    // from 10: only 11 at dist 1 — the path component is unreachable, 0 contribution
    assert(r(10L) == ((1L, 1000000L)))
  }

  test("sStemConflation: three rules, exceptions, and non-Latin passthrough") {
    val d = Seq(
      (1L, "stories story stores store cats cat bus class classes кошки")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.sStemConflation(d, "text")
      .collect().map(x => x.getString(0) -> x.getString(3)).toMap
    assert(r("story") == "stories story")   // ies -> y
    assert(r("store") == "store stores")    // es -> e
    assert(r("cat") == "cat cats")          // s -> dropped
    assert(r.get("classe").isEmpty && r.get("clas").isEmpty,
      "'-ss' exception: class/classes must not merge with a clipped stem")
    assert(!r.contains("bu"), "'-us' exception keeps bus intact")
    assert(!r.keys.exists(_.contains("кошк")), "non-Latin tokens pass through ungrouped")
  }
}
