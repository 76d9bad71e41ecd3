package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets

/** Versioned-manifest commit protocol: compose [[Upsert]] / [[Layout]]-style
  * copy-on-write rewrites into a TABLE with atomic versions and time travel —
  * the transaction-log shape every lakehouse format (Delta, Iceberg, Hudi)
  * uses, built from the same primitives the engine's checkpoint path already
  * trusts (temp file + atomic rename, `engine/Output.scala`).
  *
  * Layout on disk:
  * {{{
  *   <dir>/data/v00000001/part-*.parquet   // immutable once committed
  *   <dir>/data/v00000002/part-*.parquet
  *   <dir>/_manifests/manifest-v00000001.json
  *   <dir>/_manifests/manifest-v00000002.json
  * }}}
  *
  * A manifest is the COMPLETE file list of its version (paths relative to the
  * table dir) plus per-file key stats (rows, min/max of the integral key
  * column) — so read-at-version, zone-map range pruning and
  * [[Upsert.touchedFiles]]-style copy-on-write planning all come straight
  * from the manifest with zero data-file listing.
  *
  * The commit protocol is the whole point:
  *  1. write the new version's data files under `data/v{N+1}/` (a retry of a
  *     crashed attempt simply overwrites that staging dir — committed
  *     versions never live there);
  *  2. write the manifest JSON to a temp name;
  *  3. `FileContext.rename(tmp, manifest-v{N+1}, Rename.NONE)` — atomic, and
  *     FAILS if the manifest already exists, which is the optimistic-
  *     concurrency check: two writers racing to commit N+1 cannot both win.
  * A reader resolves `latestVersion` by listing `_manifests/` only; data
  * files not referenced by any manifest (a crashed writer's leftovers) are
  * invisible until [[vacuum]] reclaims them. Killing a writer at ANY point
  * before step 3 leaves version N exactly readable — pinned in LakeSpec by a
  * beforeCommit hook that throws.
  *
  * Scale: the manifest is file-count-sized metadata (the same driver-scale
  * contract as Delta's log replay — and the documented watch-item of
  * [[Layout.skippingRead]]); the data rewrite cost of [[upsert]] is bounded
  * by the files whose key range intersects the change set, not the table.
  * Key column must be integral (BIGINT stats in the manifest).
  */
object VersionedTable {

  final case class FileEntry(path: String, rows: Long, minKey: Long, maxKey: Long)

  /** `deleteFiles` are MERGE-ON-READ deletion vectors: parquet key lists that
    * [[read]]/[[readRange]] anti-join away without any data file having been
    * rewritten (Iceberg v2 delete-file / Delta deletion-vector semantics,
    * keyed rather than positional because the table has a declared integral
    * key). Older manifests without the field read as empty. */
  final case class Manifest(version: Long, parent: Long, action: String,
      keyCol: String, schemaDdl: String, files: Seq[FileEntry],
      deleteFiles: Seq[FileEntry] = Seq.empty)

  /** Commit lost the optimistic-concurrency race: another writer created the
    * same manifest version first. Re-read latest and retry the operation. */
  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  private val mapper = new ObjectMapper()

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long): String = f"manifest-v$v%08d.json"

  /** Highest committed version (0 = no table yet): one listing of
    * `_manifests/`, no data-file access. */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val (fs, p) = hfs(spark, s"$dir/_manifests")
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-v") && n.endsWith(".json") =>
        n.stripPrefix("manifest-v").stripSuffix(".json").toLong
      }.foldLeft(0L)(math.max)
  }

  def readManifest(spark: SparkSession, dir: String, version: Long): Manifest = {
    val (fs, p) = hfs(spark, s"$dir/_manifests/${manifestName(version)}")
    if (!fs.exists(p))
      throw new NoSuchElementException(s"no manifest for version $version at $dir")
    val in = fs.open(p)
    val json = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val node = mapper.readTree(json)
    def entries(field: String): Seq[FileEntry] = {
      val arr = node.path(field)
      (0 until arr.size()).map { i =>
        val f = arr.get(i)
        FileEntry(f.path("path").asText(), f.path("rows").asLong(),
          f.path("min_key").asLong(), f.path("max_key").asLong())
      }
    }
    Manifest(
      node.path("version").asLong(), node.path("parent").asLong(),
      node.path("action").asText(), node.path("key_col").asText(),
      node.path("schema_ddl").asText(),
      entries("files"), entries("delete_files"))
  }

  /** Atomic, exclusive manifest commit — rename WITHOUT overwrite so a
    * concurrent commit of the same version loses deterministically.
    * (private[graft] so LakeSpec can replay a losing racer directly.) */
  private[graft] def commitManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", m.version).put("parent", m.parent)
      .put("action", m.action).put("key_col", m.keyCol)
      .put("schema_ddl", m.schemaDdl)
    val arr = node.putArray("files")
    m.files.foreach { f =>
      arr.addObject().put("path", f.path).put("rows", f.rows)
        .put("min_key", f.minKey).put("max_key", f.maxKey)
    }
    if (m.deleteFiles.nonEmpty) {
      val darr = node.putArray("delete_files")
      m.deleteFiles.foreach { f =>
        darr.addObject().put("path", f.path).put("rows", f.rows)
          .put("min_key", f.minKey).put("max_key", f.maxKey)
      }
    }
    val (fs, target) = hfs(spark, s"$dir/_manifests/${manifestName(m.version)}")
    fs.mkdirs(target.getParent)
    val qTarget = fs.makeQualified(target)
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.${java.util.UUID.randomUUID()}.tmp"))
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      fc.rename(tmp, qTarget, org.apache.hadoop.fs.Options.Rename.NONE)
    } catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        fs.delete(tmp, false)
        throw new CommitConflictException(
          s"version ${m.version} was committed concurrently: $e")
    }
  }

  /** Write one version's data files (deterministic layout: range-partitioned
    * and sorted on the key, fixed file-size target — a retried attempt
    * reproduces the same content) and return their manifest entries with
    * stats from ONE metadata-sized scan. */
  private def writeVersionData(spark: SparkSession, dir: String, version: Long,
      df: DataFrame, keyCol: String, targetRowsPerFile: Long): Seq[FileEntry] =
    writeStaged(spark, dir, f"data/v$version%08d", df, keyCol, targetRowsPerFile)

  private def writeStaged(spark: SparkSession, dir: String, rel: String,
      df: DataFrame, keyCol: String, targetRowsPerFile: Long): Seq[FileEntry] = {
    val stage = s"$dir/$rel"
    val rows = df.count()
    if (rows == 0L) {
      // nothing to stage (e.g. an upsert that only deletes): empty entry list
      val (fs, p) = hfs(spark, stage)
      if (fs.exists(p)) fs.delete(p, true)
      return Seq.empty
    }
    val numFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(stage)
    spark.read.parquet(stage)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("long").as("min_key"),
        max(col(keyCol)).cast("long").as("max_key"))
      .collect().toIndexedSeq
      .map { r =>
        val uri = r.getString(0)
        FileEntry(s"$rel/${uri.substring(uri.lastIndexOf('/') + 1)}",
          r.getLong(1), r.getLong(2), r.getLong(3))
      }.sortBy(_.path)
  }

  /** Create version 1 from `df`. Refuses if the table already has commits. */
  def init(spark: SparkSession, dir: String, df: DataFrame, keyCol: String,
      targetRowsPerFile: Long = 5000L): Long = {
    val cur = latestVersion(spark, dir)
    require(cur == 0L, s"table at $dir already at version $cur")
    val entries = writeVersionData(spark, dir, 1L, df, keyCol, targetRowsPerFile)
    commitManifest(spark, dir, Manifest(1L, 0L, "init", keyCol,
      df.schema.toDDL, entries))
    1L
  }

  /** Scan `paths` under the manifest's DECLARED schema (not a sampled
    * footer's): parquet fills columns a file predates (added by
    * [[addColumn]] after it was written) with typed NULLs, column order
    * follows the declaration, and no mergeSchema footer sweep is needed —
    * Delta-style read-time schema alignment, no rewrite ever. */
  private def readDeclared(spark: SparkSession, m: Manifest, paths: Seq[String]): DataFrame =
    spark.read.schema(StructType.fromDDL(m.schemaDdl)).parquet(paths: _*)

  /** The version's deletion-vector key set (empty frame when none). */
  private def deleteKeySet(spark: SparkSession, dir: String, m: Manifest): Option[DataFrame] =
    if (m.deleteFiles.isEmpty) None
    else Some(spark.read.parquet(m.deleteFiles.map(f => s"$dir/${f.path}"): _*)
      .select(col(m.keyCol)).distinct())

  /** Apply merge-on-read deletion vectors: one LEFT ANTI join on the key.
    * The DV side is key-count-sized — tiny next to the table — so Spark
    * broadcasts it and the read stays a single scan with a broadcast probe,
    * no shuffle of the data side. */
  private def applyDeletes(spark: SparkSession, dir: String, m: Manifest,
      df: DataFrame): DataFrame =
    deleteKeySet(spark, dir, m) match {
      case None => df
      case Some(keys) => df.join(keys, Seq(m.keyCol), "left_anti")
    }

  /** Read the table at `version` (latest when -1). Exactly the manifest's
    * file list — uncommitted staging files are invisible by construction —
    * minus any deletion-vector keys ([[deleteKeys]]). */
  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, dir) else version
    val m = readManifest(spark, dir, v)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL(m.schemaDdl))
    else applyDeletes(spark, dir, m,
      readDeclared(spark, m, m.files.map(f => s"$dir/${f.path}")))
  }

  /** Create an immutable named TAG pointing at `version` (latest when -1)
    * — the Iceberg/Delta ref that turns "the snapshot we trained run X on"
    * into a durable name instead of a number someone has to remember.
    * Zero-copy by construction: a tag is one tiny JSON under `_refs/`
    * holding the version number; no data file is touched, and [[vacuum]]
    * operates on version numbers so a caller keeps tagged versions alive
    * by keeping `keepFrom` at or below them. Commit is the same atomic
    * no-overwrite rename as a manifest — re-tagging an existing name
    * raises (tags are immutable; delete-and-recreate is an explicit,
    * visible operation via [[dropTag]]). */
  def tag(spark: SparkSession, dir: String, name: String, version: Long = -1L): Long = {
    require(name.matches("[A-Za-z0-9._-]+"), s"tag name must be [A-Za-z0-9._-]+: $name")
    val v = if (version < 0) latestVersion(spark, dir) else version
    readManifest(spark, dir, v) // existence check: refuse to tag a hole
    val (fs, target) = hfs(spark, s"$dir/_refs/$name.json")
    fs.mkdirs(target.getParent)
    val qTarget = fs.makeQualified(target)
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(
      target.getParent, s".$name.${java.util.UUID.randomUUID()}.tmp"))
    val node = mapper.createObjectNode()
    node.put("name", name).put("version", v)
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      fc.rename(tmp, qTarget, org.apache.hadoop.fs.Options.Rename.NONE)
    } catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        fs.delete(tmp, false)
        throw new CommitConflictException(s"tag '$name' already exists: $e")
    }
    v
  }

  /** Resolve a tag to its version number; loud on a missing tag. */
  def tagVersion(spark: SparkSession, dir: String, name: String): Long = {
    val (fs, p) = hfs(spark, s"$dir/_refs/$name.json")
    if (!fs.exists(p))
      throw new NoSuchElementException(s"no tag '$name' at $dir")
    val in = fs.open(p)
    val json = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    mapper.readTree(json).path("version").asLong()
  }

  /** Read the table at a named tag — [[read]] at [[tagVersion]]. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, tagVersion(spark, dir, name))

  /** Delete a tag (the data and manifests are untouched — only the name
    * goes away). Returns whether the tag existed. */
  def dropTag(spark: SparkSession, dir: String, name: String): Boolean = {
    val (fs, p) = hfs(spark, s"$dir/_refs/$name.json")
    fs.delete(p, false)
  }

  /** Range read with manifest-stat pruning — the zone map IS the manifest.
    * Returns (pruned reader with the residual filter applied, files kept,
    * files total). */
  def readRange(spark: SparkSession, dir: String, lo: Long, hi: Long,
      version: Long = -1L): (DataFrame, Int, Int) = {
    val v = if (version < 0) latestVersion(spark, dir) else version
    val m = readManifest(spark, dir, v)
    val kept = m.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
    val df =
      if (kept.isEmpty) read(spark, dir, v).filter(lit(false))
      else applyDeletes(spark, dir, m,
        readDeclared(spark, m, kept.map(f => s"$dir/${f.path}")))
    (df.filter(col(m.keyCol) >= lit(lo) && col(m.keyCol) <= lit(hi)),
      kept.length, m.files.length)
  }

  /** Manifest-pruned change data feed: the added/removed/changed keys
    * between two committed versions, reading ONLY the files the two
    * manifests do NOT share. Committed data files are immutable, so a file
    * carried by reference holds bit-identical rows in both versions — every
    * change lives in the symmetric difference of the file lists, which for
    * a bounded upsert is the touched slice, not the table (at 100 TB this is
    * the difference between replaying a delta and re-reading everything).
    * [[Quality.snapshotDiff]] over the two slices classifies exactly: a key
    * only in the old slice was removed, only in the new slice added, in
    * both with differing payload changed, in both identical it sat in a
    * rewritten file untouched — and is correctly dropped as unchanged.
    * Unchanged keys in shared files never enter the diff at all.
    *
    * Falls back to the FULL two-sided read (still exact, no pruning) when a
    * schema change or outstanding deletion vectors make file identity an
    * unsound proxy for row identity. Returns (changes with `status` ∈
    * added/removed/changed, filesRead, filesTotal). */
  def changeFeed(spark: SparkSession, dir: String, vOld: Long, vNew: Long,
      cols: Seq[String]): (DataFrame, Int, Int) = {
    val mo = readManifest(spark, dir, vOld)
    val mn = readManifest(spark, dir, vNew)
    val total = mo.files.length + mn.files.length
    val prunable = mo.schemaDdl == mn.schemaDdl &&
      mo.deleteFiles.isEmpty && mn.deleteFiles.isEmpty
    def slice(m: Manifest, files: Seq[FileEntry]): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType.fromDDL(m.schemaDdl))
      else readDeclared(spark, m, files.map(f => s"$dir/${f.path}"))
    val (oldSide, newSide, filesRead) =
      if (prunable) {
        val shared = mo.files.map(_.path).toSet intersect mn.files.map(_.path).toSet
        val oldOnly = mo.files.filterNot(f => shared(f.path))
        val newOnly = mn.files.filterNot(f => shared(f.path))
        (slice(mo, oldOnly), slice(mn, newOnly), oldOnly.length + newOnly.length)
      } else (read(spark, dir, vOld), read(spark, dir, vNew), total)
    val diff = Quality.snapshotDiff(oldSide, newSide, mo.keyCol, cols)
      .filter(col("status") =!= "unchanged")
    (diff, filesRead, total)
  }

  /** Merge-on-read DELETE commit: stage the key list as a deletion-vector
    * parquet under the new version's dir and commit a manifest whose DATA
    * file list is byte-for-byte the parent's — a delete at 100 TB writes
    * O(keys) bytes and rewrites NOTHING; readers pay one broadcast anti-join
    * until [[materializeDeletes]] (or [[compact]]) folds the vectors in.
    * Keys deleted twice coalesce (the DV set is distinct per read). Returns
    * the new version. */
  def deleteKeys(spark: SparkSession, dir: String, keys: DataFrame,
      beforeCommit: () => Unit = () => ()): Long = {
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    val keyDf = keys.select(col(keys.columns.head).cast("long").as(m.keyCol)).distinct()
    val entries = writeStaged(spark, dir, f"data/v${base + 1L}%08d/dv",
      keyDf, m.keyCol, targetRowsPerFile = 1000000L)
    require(entries.nonEmpty, "deleteKeys called with an empty key set")
    beforeCommit()
    commitManifest(spark, dir, Manifest(base + 1L, base, "delete-vector",
      m.keyCol, m.schemaDdl, m.files, m.deleteFiles ++ entries))
    base + 1L
  }

  /** Fold outstanding deletion vectors into the data: copy-on-write rewrite
    * of ONLY the files whose key range intersects a delete key (manifest
    * stats prune — untouched files carry by reference), then a manifest with
    * an empty `delete_files`. The scheduled-maintenance half of the
    * merge-on-read trade, same touched-file bound as [[upsert]]. */
  def materializeDeletes(spark: SparkSession, dir: String,
      targetRowsPerFile: Long = 5000L, beforeCommit: () => Unit = () => ()): Long = {
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    val keys = deleteKeySet(spark, dir, m).getOrElse(
      return base) // nothing to materialize
    val bounds = keys.agg(min(col(m.keyCol)).as("lo"), max(col(m.keyCol)).as("hi"))
      .collect()(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // stat-prune: only files that can contain a deleted key get rewritten.
    // Range overlap vs the DV's [min,max] envelope is driver-side manifest
    // math; the per-file exact check is the anti-join itself.
    val touched = m.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
    val untouched = m.files.filterNot(f => f.maxKey >= lo && f.minKey <= hi)
    val rewritten =
      if (touched.isEmpty) Seq.empty
      else writeStaged(spark, dir, f"data/v${base + 1L}%08d",
        readDeclared(spark, m, touched.map(f => s"$dir/${f.path}"))
          .join(keys, Seq(m.keyCol), "left_anti"),
        m.keyCol, targetRowsPerFile)
    beforeCommit()
    commitManifest(spark, dir, Manifest(base + 1L, base, "materialize-deletes",
      m.keyCol, m.schemaDdl, untouched ++ rewritten, Seq.empty))
    base + 1L
  }

  /** Copy-on-write MERGE commit: rewrite ONLY the files whose key range
    * intersects the change set (manifest stats decide — [[Upsert.touchedFiles]]
    * semantics), carry every other file into version N+1 by reference, apply
    * [[Upsert.mergeUpsert]] to the touched slice. `changes` carries the base
    * schema plus `op` ('upsert' | 'delete'). `beforeCommit` runs after the
    * data write and before the manifest rename (crash-injection seam — the
    * same hook pattern as the engine's onSliceDone). Returns the new version. */
  def upsert(spark: SparkSession, dir: String, changes: DataFrame,
      targetRowsPerFile: Long = 5000L, beforeCommit: () => Unit = () => (),
      action: String = "upsert"): Long = {
    import spark.implicits._
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    // An upsert of key k while a deletion vector still holds k would
    // resurrect the delete on read (the DV anti-join cannot tell the new row
    // from the dead one). Same rule as Iceberg's rewrite-before-equality-
    // upsert: fold vectors in first.
    require(m.deleteFiles.isEmpty,
      s"table at $dir has outstanding deletion vectors — run materializeDeletes (or compact) before upsert")
    val zoneMap = m.files.toDF()
      .select(col("path"), col("minKey").as("min_key"), col("maxKey").as("max_key"))
    val touched = Upsert.touchedFiles(zoneMap, changes, m.keyCol)
      .select(col("path")).collect().map(_.getString(0)).toSet
    val touchedDf =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType.fromDDL(m.schemaDdl))
      else readDeclared(spark, m,
        m.files.collect { case f if touched(f.path) => s"$dir/${f.path}" })
    val merged = Upsert.mergeUpsert(touchedDf, changes, m.keyCol)
    val newEntries =
      writeVersionData(spark, dir, base + 1L, merged, m.keyCol, targetRowsPerFile)
    beforeCommit()
    commitManifest(spark, dir, Manifest(base + 1L, base, action, m.keyCol,
      m.schemaDdl, m.files.filterNot(f => touched(f.path)) ++ newEntries))
    base + 1L
  }

  /** Schema-evolution commit (Delta ADD COLUMN semantics): version N+1
    * declares the widened schema over the SAME file list — zero rewrite.
    * Files written before this version simply lack the column and read as
    * typed NULLs through the read-time alignment; older versions keep their
    * original schema (time travel shows the table as it was). */
  def addColumn(spark: SparkSession, dir: String, name: String, ddlType: String): Long = {
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    val schema = StructType.fromDDL(m.schemaDdl)
    require(!schema.fieldNames.contains(name), s"column $name already exists")
    val widened = StructType.fromDDL(s"${m.schemaDdl}, $name $ddlType")
    commitManifest(spark, dir, Manifest(base + 1L, base, s"add-column:$name",
      m.keyCol, widened.toDDL, m.files))
    base + 1L
  }

  /** Highest streaming batch id already committed (the Delta
    * txnAppId/txnVersion idempotence ledger, kept in the manifest `action`
    * as `stream:<batchId>`). One driver pass over the manifest chain —
    * bounded by version count; [[vacuum]]'d histories stop the walk. */
  def lastStreamBatchId(spark: SparkSession, dir: String): Long = {
    var best = -1L
    var v = latestVersion(spark, dir)
    while (v >= 1L) {
      val m = try readManifest(spark, dir, v) catch {
        case _: NoSuchElementException => return best // vacuumed below here
      }
      if (m.action.startsWith("stream:")) {
        val id = m.action.stripPrefix("stream:").toLong
        if (id > best) best = id
      }
      v = m.parent
    }
    best
  }

  /** Exactly-once streaming ingest step for `foreachBatch`: a REPLAYED
    * micro-batch (restart from checkpoint re-delivers the last batch) is
    * detected by its batch id against the manifest ledger and skipped, so
    * the version chain and content advance exactly once per batch. Returns
    * true when the batch committed, false when it was a replay. Changes
    * without an `op` column are treated as upserts. */
  def ingestBatch(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long, targetRowsPerFile: Long = 5000L): Boolean = {
    if (batchId <= lastStreamBatchId(spark, dir)) false
    else {
      val changes =
        if (batch.columns.contains("op")) batch
        else batch.withColumn("op", lit("upsert"))
      upsert(spark, dir, changes, targetRowsPerFile, action = s"stream:$batchId")
      true
    }
  }

  /** Compaction commit: rewrite the CURRENT content into
    * `targetRowsPerFile`-sized range-clustered files as version N+1 —
    * content-identical, layout renewed ([[Layout.compact]] as a transaction). */
  def compact(spark: SparkSession, dir: String, targetRowsPerFile: Long,
      beforeCommit: () => Unit = () => ()): Long = {
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    val entries = writeVersionData(spark, dir, base + 1L,
      read(spark, dir, base), m.keyCol, targetRowsPerFile)
    beforeCommit()
    commitManifest(spark, dir, Manifest(base + 1L, base, "compact", m.keyCol,
      m.schemaDdl, entries))
    base + 1L
  }

  /** Selective OPTIMIZE commit — [[graft.operators.Layout.compactionPlan]]
    * executed as a transaction, completing the planner's metadata half with
    * the data half: key-adjacent file groups packing to ~`targetRows` are
    * REWRITTEN (range-sorted, one staging subdir per group under the new
    * version), while every group that is already a single file is carried
    * into the new manifest UNTOUCHED — its entry references the same
    * physical path, zero bytes moved (the untouched-cell rule from the IVF
    * index append). That selectivity is what distinguishes OPTIMIZE from
    * [[compact]]'s full rewrite: on a mostly-healthy table the rewrite cost
    * is bounded by the small-file tail, not the table.
    *
    * Refuses tables with outstanding deletion vectors: a rewrite would
    * either bake deleted rows into fresh files or silently change the
    * kept-vs-rewritten semantics — run [[materializeDeletes]] first.
    * Planning is driver-side over the manifest (metadata-sized by the
    * class contract); ALL rewrite groups execute as ONE Spark job — each
    * small file's rows are tagged with their planned group (broadcast
    * path→group map joined on `input_file_name`), range-repartitioned on
    * (group, key), and written hive-partitioned by group — so a table
    * with ten thousand cold small-file groups costs one shuffle of the
    * small-file tail, not ten thousand driver-sequenced jobs. Time
    * travel to every prior version is untouched (old manifests only
    * reference immutable files). Returns the new version. */
  def optimize(spark: SparkSession, dir: String, targetRows: Long,
      beforeCommit: () => Unit = () => ()): Long = {
    val base = latestVersion(spark, dir)
    require(base > 0L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, base)
    require(m.deleteFiles.isEmpty,
      s"optimize at $dir: outstanding deletion vectors — materializeDeletes first")
    import spark.implicits._
    val manifestDf = m.files.map(f => (f.path, f.rows, f.minKey))
      .toDF("path", "rows", "min_key")
    val plan = Layout.compactionPlan(manifestDf, "path", "rows", "min_key", targetRows)
      .select(col("path"), col("grp")).as[(String, Long)].collect()
    val entryByPath = m.files.map(f => f.path -> f).toMap
    val byGrp = plan.groupBy(_._2).toSeq.sortBy(_._1)
    val kept = byGrp.collect { case (_, files) if files.length == 1 =>
      entryByPath(files.head._1) }
    val rewriteGroups = byGrp.collect { case (grp, files) if files.length > 1 =>
      (grp, files.map(_._1)) }
    val rel = f"data/v${base + 1L}%08d"
    val rewritten: Seq[FileEntry] = if (rewriteGroups.isEmpty) Seq.empty else {
      val mapping = rewriteGroups
        .flatMap { case (g, ps) => ps.map(p => (p, g)) }.toDF("rel_path", "grp")
      val rewriteRows = rewriteGroups.flatMap(_._2).map(entryByPath(_).rows).sum
      val src = readDeclared(spark, m,
          rewriteGroups.flatMap(_._2).map(p => s"$dir/$p").toSeq)
        // map each row back to its planned group via the file it came from
        .withColumn("rel_path", regexp_extract(input_file_name(), "(data/v.*)$", 1))
        .join(broadcast(mapping), Seq("rel_path")).drop("rel_path")
      val numParts = math.max(1L, (rewriteRows + targetRows - 1) / targetRows).toInt
      val stage = s"$dir/$rel"
      src.repartitionByRange(numParts, col("grp"), col(m.keyCol))
        .sortWithinPartitions(col("grp"), col(m.keyCol))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", targetRows)
        .partitionBy("grp")
        .parquet(stage)
      spark.read.parquet(stage)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"),
          min(col(m.keyCol)).cast("long").as("min_key"),
          max(col(m.keyCol)).cast("long").as("max_key"))
        .collect().toIndexedSeq
        .map { r =>
          val uri = r.getString(0)
          FileEntry(uri.substring(uri.indexOf(rel)),
            r.getLong(1), r.getLong(2), r.getLong(3))
        }.sortBy(_.path)
    }
    beforeCommit()
    commitManifest(spark, dir, Manifest(base + 1L, base, "optimize", m.keyCol,
      m.schemaDdl, (kept ++ rewritten).sortBy(e => (e.minKey, e.path))))
    base + 1L
  }

  // ------------------------------------------------------------- branches
  // Git-like BRANCHES beside the immutable tags: a branch is its own
  // manifest chain under `_branches/<name>/_manifests/` (same atomic
  // no-overwrite commit protocol, same local numbering starting at 1), so
  // main's latestVersion never sees branch commits. Branch manifests
  // reference data files RELATIVE TO THE TABLE ROOT — branch creation is
  // zero-copy (the fork version's file list verbatim), branch upserts
  // stage new files under `data/branch-<name>/`, and a fast-forward merge
  // publishes the branch head's file list as a normal main commit (again
  // zero-copy). The experiment-isolation workflow: branch, curate/repair
  // on the branch, validate, merge — main readers never see intermediate
  // states. [[vacuum]] treats every branch head chain as live references.

  private def branchRoot(dir: String, name: String): String =
    s"$dir/_branches/$name"

  /** Staging directory (relative to the table root) for THIS branch
    * incarnation — recorded in the fork manifest's action string at
    * [[createBranch]] time, probed to be globally fresh. Keyed by
    * incarnation rather than by name alone because the documented
    * branch lifecycle (create → upsert → merge → drop → re-create the
    * same name) would otherwise stage the new incarnation's files over
    * the very paths the fast-forward merge published into MAIN's
    * manifest: `data/branch-<name>/v00000002` collides across
    * generations, and writeStaged's overwrite would silently corrupt
    * committed main versions. Fork-version salting alone is not enough
    * either (explicit `fromVersion` can re-fork at the same version), so
    * creation probes `-g2`, `-g3`, … until an unused directory is found. */
  private def branchStageRel(spark: SparkSession, dir: String, name: String): String = {
    val (fs, _) = hfs(spark, dir)
    Iterator.from(1)
      .map(g => if (g == 1) s"data/branch-$name" else s"data/branch-$name-g$g")
      .find(rel => !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$rel")))
      .get
  }

  /** The incarnation staging prefix the fork manifest recorded; branches
    * created before the stage= token existed fall back to the legacy
    * un-salted path (their files are already live — never re-probed). */
  private def stageRelOf(fork: Manifest, name: String): String =
    fork.action.split(" stage=", 2) match {
      case Array(_, rel) => rel
      case _             => s"data/branch-$name"
    }

  /** Fork a branch from `fromVersion` (main's latest when -1) — one tiny
    * manifest commit, zero data files touched. Refuses an existing name. */
  def createBranch(spark: SparkSession, dir: String, name: String,
      fromVersion: Long = -1L): Long = {
    require(name.matches("[A-Za-z0-9._-]+") && name.exists(_ != '.'),
      s"branch name must be [A-Za-z0-9._-]+ and not all dots: $name")
    val v = if (fromVersion < 0) latestVersion(spark, dir) else fromVersion
    require(v >= 1L, s"no table at $dir — init first")
    val m = readManifest(spark, dir, v)
    val broot = branchRoot(dir, name)
    if (latestVersion(spark, broot) != 0L)
      throw new CommitConflictException(s"branch '$name' already exists at $dir")
    val stageRel = branchStageRel(spark, dir, name)
    commitManifest(spark, broot, Manifest(1L, v, s"branch-from:$v stage=$stageRel",
      m.keyCol, m.schemaDdl, m.files, m.deleteFiles))
    1L
  }

  /** The branch's local head version; loud on a missing branch. */
  def branchHead(spark: SparkSession, dir: String, name: String): Long = {
    val h = latestVersion(spark, branchRoot(dir, name))
    if (h == 0L) throw new NoSuchElementException(s"no branch '$name' at $dir")
    h
  }

  /** Read a branch at its local `bVersion` (head when -1): the branch
    * manifest's files resolved against the TABLE root. */
  def readBranch(spark: SparkSession, dir: String, name: String,
      bVersion: Long = -1L): DataFrame = {
    val broot = branchRoot(dir, name)
    val v = if (bVersion < 0) branchHead(spark, dir, name) else bVersion
    val m = readManifest(spark, broot, v)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL(m.schemaDdl))
    else applyDeletes(spark, dir, m,
      readDeclared(spark, m, m.files.map(f => s"$dir/${f.path}")))
  }

  /** Copy-on-write upsert AGAINST THE BRANCH HEAD — [[upsert]]'s exact
    * semantics with the branch manifest as base; new files stage under
    * `data/branch-<name>/` so chains never collide. Main is untouched. */
  def upsertBranch(spark: SparkSession, dir: String, name: String,
      changes: DataFrame, targetRowsPerFile: Long = 5000L): Long = {
    import spark.implicits._
    val broot = branchRoot(dir, name)
    val base = branchHead(spark, dir, name)
    val m = readManifest(spark, broot, base)
    require(m.deleteFiles.isEmpty,
      s"branch '$name' has outstanding deletion vectors — materialize before upsert")
    val zoneMap = m.files.toDF()
      .select(col("path"), col("minKey").as("min_key"), col("maxKey").as("max_key"))
    val touched = Upsert.touchedFiles(zoneMap, changes, m.keyCol)
      .select(col("path")).collect().map(_.getString(0)).toSet
    val touchedDf =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType.fromDDL(m.schemaDdl))
      else readDeclared(spark, m,
        m.files.collect { case f if touched(f.path) => s"$dir/${f.path}" })
    val merged = Upsert.mergeUpsert(touchedDf, changes, m.keyCol)
    val stageRel = stageRelOf(readManifest(spark, broot, 1L), name)
    val newEntries = writeStaged(spark, dir,
      f"$stageRel/v${base + 1L}%08d", merged, m.keyCol, targetRowsPerFile)
    commitManifest(spark, broot, Manifest(base + 1L, base, "upsert", m.keyCol,
      m.schemaDdl, m.files.filterNot(f => touched(f.path)) ++ newEntries))
    base + 1L
  }

  /** FAST-FORWARD merge: publish the branch head's file list as main's
    * next version — zero bytes moved. Refuses when main advanced past the
    * branch's fork point (a three-way merge would need key-level conflict
    * resolution; rebase by re-branching instead — the refusal names both
    * versions). Returns the new MAIN version. */
  def mergeBranch(spark: SparkSession, dir: String, name: String): Long = {
    val broot = branchRoot(dir, name)
    val fork = readManifest(spark, broot, 1L).parent
    val mainHead = latestVersion(spark, dir)
    if (mainHead != fork)
      throw new CommitConflictException(
        s"branch '$name' forked at v$fork but main is at v$mainHead — " +
          "fast-forward refused; re-branch from the current head and replay")
    val head = readManifest(spark, broot, branchHead(spark, dir, name))
    commitManifest(spark, dir, Manifest(mainHead + 1L, mainHead, s"merge:$name",
      head.keyCol, head.schemaDdl, head.files, head.deleteFiles))
    mainHead + 1L
  }

  /** Delete a branch's manifest chain (its staged `data/branch-<name>/`
    * files become vacuum-eligible). Returns whether the branch existed. */
  def dropBranch(spark: SparkSession, dir: String, name: String): Boolean = {
    val (fs, p) = hfs(spark, branchRoot(dir, name))
    fs.delete(p, true)
  }

  /** Every data file referenced by any live branch manifest (all branch
    * versions — branches are short-lived by design; drop merged branches
    * to release their intermediates). */
  private def branchLiveFiles(spark: SparkSession, dir: String): Set[String] = {
    val (fs, p) = hfs(spark, s"$dir/_branches")
    if (!fs.exists(p)) return Set.empty
    fs.listStatus(p).iterator.filter(_.isDirectory).flatMap { st =>
      val broot = s"$dir/_branches/${st.getPath.getName}"
      (1L to latestVersion(spark, broot)).flatMap { v =>
        val m = readManifest(spark, broot, v)
        (m.files ++ m.deleteFiles).map(_.path)
      }
    }.toSet
  }

  /** Reclaim data files referenced by NO manifest version >= `keepFrom`
    * AND no live branch (crashed-writer leftovers and files superseded by
    * compaction/upsert), and drop the manifests below `keepFrom`. Time
    * travel to vacuumed versions stops working — the standard retention
    * trade. Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long): Int = {
    val latest = latestVersion(spark, dir)
    require(keepFrom <= latest, s"keepFrom $keepFrom beyond latest $latest")
    val live = (keepFrom to latest)
      .flatMap { v =>
        val m = readManifest(spark, dir, v)
        (m.files ++ m.deleteFiles).map(_.path)
      }.toSet ++ branchLiveFiles(spark, dir)
    val (fs, dataRoot) = hfs(spark, s"$dir/data")
    var deleted = 0
    if (fs.exists(dataRoot)) {
      val rootUri = fs.makeQualified(new org.apache.hadoop.fs.Path(dir)).toUri.getPath
      def walk(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory) walk(st.getPath)
          else if (!name.startsWith("_") && !name.startsWith(".")) {
            val rel = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
            if (!live.contains(rel)) { fs.delete(st.getPath, false); deleted += 1 }
          }
        }
      walk(dataRoot)
    }
    (1L until keepFrom).foreach { v =>
      val (mfs, mp) = hfs(spark, s"$dir/_manifests/${manifestName(v)}")
      if (mfs.exists(mp)) mfs.delete(mp, false)
    }
    deleted
  }

  /** Drop the whole table (test/gate setup helper). */
  def destroy(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = hfs(spark, dir)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
