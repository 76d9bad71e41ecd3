package graft

import graft.operators.{Upsert, VersionedTable => VT}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The versioned-manifest commit protocol's contracts: atomic visibility
  * (a killed writer leaves the prior version exactly readable), retry
  * equivalence (a retried commit produces the same content the uninterrupted
  * run would have), optimistic concurrency (racing commits of the same
  * version cannot both win), time travel, manifest-stat range pruning, and
  * vacuum reclaim. */
class LakeSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_lake_$tag").toString
    VT.destroy(spark, d)
    d
  }

  private lazy val base: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars").cache()

  // changes confined to doc_id < 200 so files covering higher key ranges are
  // provably untouched by the copy-on-write rewrite
  private def changeSet(df: DataFrame): DataFrame = {
    val mods = df.filter($"doc_id" % 7 === 0 && $"doc_id" < 200)
      .withColumn("op", when($"doc_id" % 14 === 0, lit("delete")).otherwise(lit("upsert")))
      .withColumn("text", when($"op" === "upsert", concat($"text", lit(" v2"))).otherwise($"text"))
    val ins = df.filter($"doc_id" < 5)
      .select(($"doc_id" + 500000L).as("doc_id"), concat(lit("new "), $"text").as("text"),
        $"lang", $"source", $"n_chars")
      .withColumn("op", lit("upsert"))
    mods.unionByName(ins)
  }

  private def sameContent(a: DataFrame, b: DataFrame): Boolean =
    a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty

  test("init + upsert: latest matches mergeUpsert; v1 time travel intact") {
    val dir = freshDir("basic")
    assert(VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L) == 1L)
    val v2 = VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 50L)
    assert(v2 == 2L)
    val expected = Upsert.mergeUpsert(base, changeSet(base), "doc_id")
    assert(sameContent(VT.read(spark, dir), expected))
    assert(sameContent(VT.read(spark, dir, 1L), base))
    val m2 = VT.readManifest(spark, dir, 2L)
    assert(m2.parent == 1L && m2.action == "upsert")
    // copy-on-write actually carried untouched v1 files by reference
    assert(m2.files.exists(_.path.startsWith("data/v00000001/")),
      "expected at least one untouched v1 file carried into v2")
    assert(m2.files.exists(_.path.startsWith("data/v00000002/")))
  }

  test("kill before manifest rename: v1 exactly readable; retry == uninterrupted") {
    val dir = freshDir("crash")
    val twin = freshDir("crash_twin")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    VT.init(spark, twin, base, "doc_id", targetRowsPerFile = 50L)
    // the uninterrupted twin commits v2 normally
    VT.upsert(spark, twin, changeSet(base), targetRowsPerFile = 50L)
    // the writer dies AFTER writing data files, BEFORE the manifest rename
    intercept[RuntimeException] {
      VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 50L,
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(VT.latestVersion(spark, dir) == 1L, "crashed commit must be invisible")
    assert(sameContent(VT.read(spark, dir), base), "v1 must read exactly")
    // retry: same version number, same content as the uninterrupted twin,
    // same per-file stats (deterministic staging layout)
    assert(VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 50L) == 2L)
    assert(sameContent(VT.read(spark, dir, 2L), VT.read(spark, twin, 2L)))
    val statsOf = (d: String) => VT.readManifest(spark, d, 2L).files
      .map(f => (f.rows, f.minKey, f.maxKey)).sorted
    assert(statsOf(dir) == statsOf(twin))
  }

  test("optimistic concurrency: second commit of the same version fails") {
    val dir = freshDir("race")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 100L)
    // writer A commits v2 first; writer B (same base) must lose at the rename
    VT.compact(spark, dir, targetRowsPerFile = 200L)
    val m1 = VT.readManifest(spark, dir, 1L)
    intercept[VT.CommitConflictException] {
      // replay writer B: hand-commit a manifest for the now-taken version 2
      VT.commitManifest(spark, dir, m1.copy(version = 2L, parent = 1L))
    }
    assert(VT.latestVersion(spark, dir) == 2L)
  }

  test("readRange prunes files from manifest stats; content equals plain filter") {
    val dir = freshDir("range")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    val (pruned, kept, total) = VT.readRange(spark, dir, 100L, 200L)
    assert(total > 1 && kept < total, s"expected pruning, kept $kept of $total")
    assert(sameContent(pruned, base.filter($"doc_id".between(100L, 200L))))
  }

  test("vacuum reclaims superseded + orphaned files; survivors still read") {
    val dir = freshDir("vacuum")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    // orphan from a crashed v2 attempt...
    intercept[RuntimeException] {
      VT.compact(spark, dir, targetRowsPerFile = 200L,
        beforeCommit = () => throw new RuntimeException("die"))
    }
    // ...then a successful v2 (overwrites the staging dir) and a v3
    VT.compact(spark, dir, targetRowsPerFile = 200L)
    VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 200L)
    val deleted = VT.vacuum(spark, dir, keepFrom = 3L)
    assert(deleted > 0, "v1 files (superseded by compact) must be reclaimed")
    assert(sameContent(VT.read(spark, dir),
      Upsert.mergeUpsert(base, changeSet(base), "doc_id")))
    intercept[NoSuchElementException] { VT.readManifest(spark, dir, 1L) }
  }

  test("upsert rewrites only intersecting files: disjoint-key change leaves base files") {
    val dir = freshDir("cow")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    val far = base.limit(3)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text", $"lang", $"source", $"n_chars")
      .withColumn("op", lit("upsert"))
    VT.upsert(spark, dir, far, targetRowsPerFile = 50L)
    val m2 = VT.readManifest(spark, dir, 2L)
    val v1 = VT.readManifest(spark, dir, 1L)
    // every original file survives untouched; exactly the new rows are new
    assert(v1.files.toSet.subsetOf(m2.files.toSet))
    assert(m2.files.map(_.rows).sum == v1.files.map(_.rows).sum + 3)
  }

  test("changeFeed prunes to the manifest file diff; pruned == full diff minus unchanged") {
    val dir = freshDir("cdc")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    // edits confined to low keys + an append far away: most base files are
    // shared by reference between v1 and v2 and must not be read
    val mods = base.filter($"doc_id" < 30)
      .withColumn("op", when($"doc_id" % 2 === 0, lit("delete")).otherwise(lit("upsert")))
      .withColumn("text", when($"op" === "upsert", concat($"text", lit(" cdc"))).otherwise($"text"))
    VT.upsert(spark, dir, mods, targetRowsPerFile = 50L)
    val cols = Seq("text", "lang", "source", "n_chars")
    val (pruned, read, total) = VT.changeFeed(spark, dir, 1L, 2L, cols)
    assert(read < total / 2, s"pruning ineffective: read $read of $total files")
    val full = graft.operators.Quality.snapshotDiff(
      VT.read(spark, dir, 1L), VT.read(spark, dir, 2L), "doc_id", cols)
      .filter($"status" =!= "unchanged")
    assert(pruned.orderBy("doc_id").collect().toSeq ==
      full.orderBy("doc_id").collect().toSeq)
    // outstanding deletion vectors void file-identity pruning: exact
    // fallback, full read
    VT.deleteKeys(spark, dir, base.filter($"doc_id" === 31L).select($"doc_id"))
    val (dv, readDv, totalDv) = VT.changeFeed(spark, dir, 2L, 3L, cols)
    assert(readDv == totalDv)
    assert(dv.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((31L, "removed")))
  }

  test("addColumn: zero-rewrite widening, NULL-filled history, time travel keeps old schema") {
    val dir = freshDir("evolve")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    val v2 = VT.addColumn(spark, dir, "quality", "DOUBLE")
    assert(v2 == 2L)
    // same files, widened declared schema
    assert(VT.readManifest(spark, dir, 2L).files == VT.readManifest(spark, dir, 1L).files)
    val widened = VT.read(spark, dir)
    assert(widened.columns.last == "quality")
    assert(widened.filter($"quality".isNotNull).count() == 0)
    assert(widened.drop("quality").count() == base.count())
    // new writes carry the column; old files still align
    val upd = base.filter($"doc_id" < 5)
      .withColumn("quality", lit(0.5)).withColumn("op", lit("upsert"))
    VT.upsert(spark, dir, upd, targetRowsPerFile = 50L)
    val cur = VT.read(spark, dir)
    assert(cur.filter($"quality".isNotNull).count() == 5)
    assert(cur.count() == base.count())
    // range reads align too (pruned files predate the column)
    val (ranged, _, _) = VT.readRange(spark, dir, 300L, 400L)
    assert(ranged.columns.contains("quality"))
    // time travel: version 1 shows the table as it was
    assert(!VT.read(spark, dir, 1L).columns.contains("quality"))
    // duplicate column refused loudly
    intercept[IllegalArgumentException](VT.addColumn(spark, dir, "quality", "DOUBLE"))
  }

  test("streaming ingest ledger: replayed micro-batches commit exactly once") {
    val dir = freshDir("stream")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    val b0 = base.filter($"doc_id" < 3)
      .withColumn("text", concat($"text", lit(" s0")))
    assert(VT.ingestBatch(spark, dir, b0, batchId = 0L, targetRowsPerFile = 50L))
    val vAfter = VT.latestVersion(spark, dir)
    val contentAfter = VT.read(spark, dir).collect().toSet
    // foreachBatch redelivers the last batch after a checkpoint restart:
    // the ledger must turn the replay into a no-op
    assert(!VT.ingestBatch(spark, dir, b0, batchId = 0L, targetRowsPerFile = 50L))
    assert(VT.latestVersion(spark, dir) == vAfter)
    assert(VT.read(spark, dir).collect().toSet == contentAfter)
    // the next batch advances; interleaved non-stream commits don't reset
    // the ledger (the walk follows parent links, not just the tip)
    VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 50L)
    assert(VT.lastStreamBatchId(spark, dir) == 0L)
    val b1 = base.filter($"doc_id" < 3)
      .withColumn("text", concat($"text", lit(" s1")))
    assert(VT.ingestBatch(spark, dir, b1, batchId = 1L, targetRowsPerFile = 50L))
    assert(VT.lastStreamBatchId(spark, dir) == 1L)
    assert(VT.read(spark, dir).filter($"text".endsWith(" s1")).count() == 3)
  }

  test("deletion vectors: zero-rewrite delete, read applies DV, materialize folds it in") {
    val dir = freshDir("dv")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 50L)
    val m1 = VT.readManifest(spark, dir, 1L)
    val keys = base.filter($"doc_id" % 5 === 1).select($"doc_id")
    val nDeleted = keys.count()
    VT.deleteKeys(spark, dir, keys)
    val m2 = VT.readManifest(spark, dir, 2L)
    // merge-on-read: the DATA file list is the parent's VERBATIM — a delete
    // at 100 TB writes O(keys) bytes and rewrites nothing
    assert(m2.files == m1.files)
    assert(m2.deleteFiles.nonEmpty)
    val expected = base.filter($"doc_id" % 5 =!= 1)
    assert(sameContent(VT.read(spark, dir), expected))
    assert(VT.read(spark, dir).count() == base.count() - nDeleted)
    // time travel below the DV commit still sees the full corpus
    assert(sameContent(VT.read(spark, dir, 1L), base))
    // range read applies the vector too
    val (ranged, _, _) = VT.readRange(spark, dir, 0L, 100L)
    assert(sameContent(ranged, expected.filter($"doc_id" <= 100)))
    // an upsert over outstanding vectors could resurrect deleted keys —
    // must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      VT.upsert(spark, dir, base.limit(1).withColumn("op", lit("upsert")))
    }
    assert(ex.getMessage.contains("deletion vectors"))
    // materialize: only key-intersecting files rewritten, vectors cleared,
    // content unchanged
    val v3 = VT.materializeDeletes(spark, dir, targetRowsPerFile = 50L)
    val m3 = VT.readManifest(spark, dir, v3)
    assert(m3.deleteFiles.isEmpty)
    assert(sameContent(VT.read(spark, dir), expected))
    // after materialization a deleted key can be re-inserted and survives
    val back = base.filter($"doc_id" === 1L).withColumn("op", lit("upsert"))
    VT.upsert(spark, dir, back, targetRowsPerFile = 50L)
    assert(VT.read(spark, dir).filter($"doc_id" === 1L).count() == 1L)
    // double-delete of the same key coalesces (DV set is distinct per read)
    VT.deleteKeys(spark, dir, base.filter($"doc_id" === 1L).select($"doc_id"))
    VT.deleteKeys(spark, dir, base.filter($"doc_id" === 1L).select($"doc_id"))
    assert(VT.read(spark, dir).filter($"doc_id" === 1L).count() == 0L)
    // vacuum keeps live delete files: the DV read still works after reclaim
    val latest = VT.latestVersion(spark, dir)
    VT.vacuum(spark, dir, keepFrom = latest)
    assert(VT.read(spark, dir).filter($"doc_id" === 1L).count() == 0L)
  }

  test("optimize: multi-file groups rewritten, single-file groups kept by reference, history intact") {
    val dir = freshDir("opt")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 100L)
    val m1 = VT.readManifest(spark, dir, 1L)
    val v2 = VT.optimize(spark, dir, targetRows = 150L)
    assert(v2 == 2L)
    val m2 = VT.readManifest(spark, dir, 2L)
    assert(m2.action == "optimize" && m2.parent == 1L)
    // against uniform 100-row files, cum div 150 alternates 2-file rewrite
    // groups with 1-file kept groups: both branches must be present
    val keptPaths = m2.files.map(_.path).filter(_.startsWith("data/v00000001/"))
    val rewrittenPaths = m2.files.map(_.path).filter(_.startsWith("data/v00000002/"))
    assert(keptPaths.nonEmpty, "expected single-file groups carried by reference")
    assert(rewrittenPaths.nonEmpty, "expected multi-file groups rewritten")
    // kept entries are v1 entries VERBATIM (same path, same stats)
    val m1ByPath = m1.files.map(f => f.path -> f).toMap
    keptPaths.foreach(p => assert(m2.files.find(_.path == p).get == m1ByPath(p)))
    // content round-trips and v1 time travel is untouched
    assert(sameContent(VT.read(spark, dir), base))
    assert(sameContent(VT.read(spark, dir, 1L), base))
    // total rows conserved in the manifest stats
    assert(m2.files.map(_.rows).sum == m1.files.map(_.rows).sum)
    // outstanding deletion vectors refuse loudly
    val dvDir = freshDir("optdv")
    VT.init(spark, dvDir, base, "doc_id", targetRowsPerFile = 100L)
    VT.deleteKeys(spark, dvDir, base.filter($"doc_id" % 9 === 0).select($"doc_id"))
    val e = intercept[IllegalArgumentException](VT.optimize(spark, dvDir, 150L))
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("compactionPlan: key-adjacent groups near target, every file in exactly one group") {
    import graft.operators.Layout
    val manifest = Seq(
      ("a", 100L, 0L), ("b", 100L, 10L), ("c", 100L, 20L),
      ("d", 250L, 30L), ("e", 40L, 40L), ("f", 40L, 50L))
      .toDF("path", "rows", "min_key")
    val plan = Layout.compactionPlan(manifest, "path", "rows", "min_key", 300L)
      .orderBy("min_key").collect()
    assert(plan.map(_.getString(0)).toSeq == Seq("a", "b", "c", "d", "e", "f"))
    val grps = plan.map(r => r.getString(0) -> r.getLong(3)).toMap
    // cum before: a0 b100 c200 d300 e550 f590 -> groups 0,0,0,1,1,1
    assert(grps("a") == 0 && grps("b") == 0 && grps("c") == 0, grps.toString)
    assert(grps("d") == 1 && grps("e") == 1 && grps("f") == 1, grps.toString)
    // group stats consistent and every file covered exactly once
    assert(plan.map(_.getLong(4)).toSet == Set(300L, 330L))
    assert(plan.map(r => (r.getLong(3), r.getString(0))).distinct.length == 6)
    // groups are key-CONTIGUOUS: min_keys within a group form a run
    val byGrp = plan.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(2)).sorted).toMap
    assert(byGrp(0L).max < byGrp(1L).min)
  }

  test("tags: named ref reads the tagged version, tags are immutable, drop removes only the name") {
    val dir = freshDir("tags")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 200L)
    VT.upsert(spark, dir, changeSet(base), targetRowsPerFile = 200L)
    // tag v1 explicitly and the latest implicitly
    assert(VT.tag(spark, dir, "pre-merge", 1L) == 1L)
    assert(VT.tag(spark, dir, "latest-run") == 2L)
    assert(VT.tagVersion(spark, dir, "pre-merge") == 1L)
    assert(sameContent(VT.readTag(spark, dir, "pre-merge"), VT.read(spark, dir, 1L)))
    assert(sameContent(VT.readTag(spark, dir, "latest-run"), VT.read(spark, dir, 2L)))
    // immutable: re-tagging an existing name raises, content unchanged
    assertThrows[VT.CommitConflictException](VT.tag(spark, dir, "pre-merge", 2L))
    assert(VT.tagVersion(spark, dir, "pre-merge") == 1L)
    // a bad name or a hole refuses up front
    assertThrows[IllegalArgumentException](VT.tag(spark, dir, "no/slashes", 1L))
    assertThrows[NoSuchElementException](VT.tag(spark, dir, "ghost", 99L))
    // drop removes the NAME only — the version stays readable by number
    assert(VT.dropTag(spark, dir, "pre-merge"))
    assertThrows[NoSuchElementException](VT.tagVersion(spark, dir, "pre-merge"))
    assert(sameContent(VT.read(spark, dir, 1L), base))
    assert(!VT.dropTag(spark, dir, "pre-merge"))
  }

  test("branches: isolation until merge, fast-forward only, vacuum honors branch refs") {
    val dir = freshDir("branch")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 200L)
    assert(VT.createBranch(spark, dir, "exp") == 1L)
    assertThrows[VT.CommitConflictException](VT.createBranch(spark, dir, "exp"))
    // zero-copy fork: branch b1 reads exactly main v1
    assert(sameContent(VT.readBranch(spark, dir, "exp"), base))
    // branch upsert: visible on the branch, INVISIBLE on main
    VT.upsertBranch(spark, dir, "exp", changeSet(base), targetRowsPerFile = 200L)
    assert(VT.latestVersion(spark, dir) == 1L, "branch commits must not advance main")
    assert(sameContent(VT.read(spark, dir), base))
    val expected = Upsert.mergeUpsert(base, changeSet(base), "doc_id")
    assert(sameContent(VT.readBranch(spark, dir, "exp"), expected))
    // vacuum at the main head must NOT reclaim branch-staged files
    assert(VT.vacuum(spark, dir, keepFrom = 1L) == 0)
    assert(sameContent(VT.readBranch(spark, dir, "exp"), expected))
    // fast-forward merge publishes the branch head as main v2
    assert(VT.mergeBranch(spark, dir, "exp") == 2L)
    assert(sameContent(VT.read(spark, dir), expected))
    assert(sameContent(VT.read(spark, dir, 1L), base), "history intact through merge")
    // main has advanced past the fork: a second merge of the same branch refuses
    assertThrows[VT.CommitConflictException](VT.mergeBranch(spark, dir, "exp"))
    // ...and so does a branch forked before another main commit
    VT.createBranch(spark, dir, "stale", fromVersion = 1L)
    assertThrows[VT.CommitConflictException](VT.mergeBranch(spark, dir, "stale"))
    // dropBranch releases the refs; vacuum keeps everything main references
    assert(VT.dropBranch(spark, dir, "exp"))
    assert(VT.dropBranch(spark, dir, "stale"))
    assert(!VT.dropBranch(spark, dir, "exp"))
    VT.vacuum(spark, dir, keepFrom = 1L)
    assert(sameContent(VT.read(spark, dir), expected))
    assert(sameContent(VT.read(spark, dir, 1L), base))
  }

  test("branch re-creation stages in a fresh incarnation dir — merged main versions survive") {
    // the ADVICE-high r14 scenario: create -> upsert -> merge -> drop ->
    // re-create THE SAME NAME (explicitly at the original fork version, the
    // worst case) -> upsert. Before the incarnation-salted staging path the
    // second upsert overwrote data/branch-exp/v00000002 — the exact files
    // the fast-forward merge had published into main v2.
    val dir = freshDir("branch_regen")
    VT.init(spark, dir, base, "doc_id", targetRowsPerFile = 200L)
    VT.createBranch(spark, dir, "exp")
    VT.upsertBranch(spark, dir, "exp", changeSet(base), targetRowsPerFile = 200L)
    val expected = Upsert.mergeUpsert(base, changeSet(base), "doc_id")
    assert(VT.mergeBranch(spark, dir, "exp") == 2L)
    assert(VT.dropBranch(spark, dir, "exp"))
    // same name, same fork version, DIFFERENT rows
    VT.createBranch(spark, dir, "exp", fromVersion = 1L)
    val other = changeSet(base).withColumn("n_chars",
      org.apache.spark.sql.functions.col("n_chars") + 7777L)
    VT.upsertBranch(spark, dir, "exp", other, targetRowsPerFile = 200L)
    // main v2 (the merged content) must be byte-for-byte intact
    assert(sameContent(VT.read(spark, dir, 2L), expected),
      "re-created branch staging must never overwrite merged main files")
    assert(sameContent(VT.read(spark, dir), expected))
    // and the new incarnation's own content is what IT wrote
    assert(sameContent(VT.readBranch(spark, dir, "exp"),
      Upsert.mergeUpsert(base, other, "doc_id")))
  }
}
