package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** X141: versioned snapshot tables — the ACID-ish commit layer the
  * in-place [[TableStore]] (and the CDC family that rewrites through it,
  * x105–x109) deliberately lacks. The public Iceberg/Delta idea in its
  * minimal sound form:
  *
  *   `<root>/<table>/data/v<N>/`    immutable parquet file set per commit
  *   `<root>/<table>/meta/v<N>`     manifest: the data dirs OR individual
  *                                  files composing snapshot N (one
  *                                  relative path/line — keyed commits
  *                                  list files so CoW merges can reuse
  *                                  them individually)
  *   `<root>/<table>/zones/v<N>/`   per-file key ranges of a KEYED
  *                                  version ([[commitOverwriteKeyed]]) —
  *                                  what [[commitMergeCow]] prunes with
  *   `<root>/<table>/meta/_current` pointer: the committed version number
  *
  * A commit is: write data (new dir, never touching existing files) →
  * write the manifest → ATOMICALLY swap the pointer (write-temp +
  * ATOMIC_MOVE rename). Readers resolve the pointer, then read exactly
  * the dirs its manifest lists — so a commit that dies before the swap
  * leaves orphan files but a fully intact, readable table (the spec
  * simulates that death at the seam), and a retry of version N may
  * overwrite N's never-visible leftovers without coordination
  * (single-writer semantics, as documented on TableStore).
  *
  * What each operation costs at 100 TB:
  *   - append: writes ONLY the batch; the manifest grows by one line.
  *   - overwrite: writes the replacement; old versions stay readable.
  *   - rollback(v): METADATA-ONLY — a new version whose manifest is a
  *     copy of v's; no data moves. History stays linear and append-only
  *     (an Iceberg rollback-to-snapshot, not a pointer rewind — the bad
  *     version remains auditable).
  *   - readVersion(v): planning-time pruning to v's dirs; time travel
  *     never scans rewritten-away files.
  *   - vacuum: deletes data dirs no manifest references (failed-commit
  *     orphans) — the only operation that deletes anything.
  */
final class SnapshotStore(spark: SparkSession, root: String) {

  require(!root.exists(c => " '%#?".contains(c)),
    s"SnapshotStore root '$root' contains characters that URI-encode in " +
      "input_file_name or break zone-path extraction - use a plain path")
  Files.createDirectories(Paths.get(root))

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def dataDir(name: String): Path = tableDir(name).resolve("data")
  private def metaDir(name: String): Path = tableDir(name).resolve("meta")
  private def manifestPath(name: String, v: Long): Path =
    metaDir(name).resolve(s"v$v")
  private def pointerPath(name: String): Path =
    metaDir(name).resolve("_current")

  /** Same rationale as TableStore.escapeGlob: reads glob-expand. */
  private def escapeGlob(s: String): String =
    s.replaceAll("([\\[\\]{}*?\\\\])", "\\\\$1")

  def exists(name: String): Boolean = Files.exists(pointerPath(name))

  /** The committed version, 0 if the table has never committed. */
  def currentVersion(name: String): Long =
    if (!exists(name)) 0L
    else new String(Files.readAllBytes(pointerPath(name)),
      StandardCharsets.UTF_8).trim.toLong

  private def expiredPath(name: String): Path =
    metaDir(name).resolve("_expired")

  /** Highest EXPIRED version (0 = nothing expired). Versions at or below
    * are gone from the readable history. */
  def expiredBelow(name: String): Long =
    if (!Files.exists(expiredPath(name))) 0L
    else new String(Files.readAllBytes(expiredPath(name)),
      StandardCharsets.UTF_8).trim.toLong

  /** Every LIVE committed version, ascending. Manifests above the pointer
    * (a commit that died pre-swap) and at or below the expiry floor are
    * invisible here, as to readers. */
  def versions(name: String): Seq[Long] =
    (expiredBelow(name) + 1) to currentVersion(name)

  private[graft] def readManifest(name: String, v: Long): Seq[String] = {
    require(v > expiredBelow(name) && v <= currentVersion(name),
      s"version $v of '$name' does not exist " +
        s"(live: ${expiredBelow(name) + 1}..${currentVersion(name)})")
    Files.readAllLines(manifestPath(name, v), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
  }

  /** Expire every version BELOW `keepFrom` (Iceberg's expire-snapshots):
    * they leave the readable history atomically (tmp + rename of the
    * expiry floor), then [[vacuum]] reclaims any data dir only they
    * referenced. Files an expired version shares with a live one (CoW
    * reuse) survive — the live manifests still reference them. Returns
    * the data dirs reclaimed. */
  def expireVersions(name: String, keepFrom: Long): Seq[String] = {
    val cur = currentVersion(name)
    require(keepFrom >= expiredBelow(name) + 1 && keepFrom <= cur,
      s"keepFrom $keepFrom outside live range " +
        s"${expiredBelow(name) + 1}..$cur of '$name'")
    val tmp = metaDir(name).resolve("_expired.tmp")
    Files.write(tmp, s"${keepFrom - 1}\n".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, expiredPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    vacuum(name)
  }

  /** Scan exactly `entries` (dirs or individual files) of `name`; an
    * empty entry set yields the empty frame with `schemaOf`'s schema —
    * the ONE definition of the manifest-entry scan (readVersion,
    * readVersionWhere and the CoW merge's base all route here). */
  private def readEntries(name: String, entries: Seq[String],
                          schemaOf: => DataFrame): DataFrame =
    if (entries.isEmpty)
      schemaOf.filter(org.apache.spark.sql.functions.lit(false))
    else spark.read.parquet(entries.sorted
      .map(e => escapeGlob(dataDir(name).resolve(e).toString)): _*)

  /** Read snapshot `v` — exactly the file sets its manifest lists,
    * regardless of every commit made since. */
  def readVersion(name: String, v: Long): DataFrame =
    readEntries(name, readManifest(name, v),
      throw new IllegalStateException(
        s"version $v of '$name' has an empty manifest"))

  def readCurrent(name: String): DataFrame =
    readVersion(name, currentVersion(name))

  /** Stage version `v`: write the batch's data dir (when `df` is set) and
    * the manifest, WITHOUT making `v` visible. This is the commit's
    * pre-swap half — public-to-the-spec seam for proving that a death
    * here leaves the table intact. Returns rows written. */
  private[graft] def stage(name: String, v: Long, df: Option[DataFrame],
                           dirs: Seq[String]): Long = {
    Files.createDirectories(metaDir(name))
    val n = df.fold(0L) { d =>
      val obs = org.apache.spark.sql.Observation()
      d.observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite) // retry of a dead commit may reuse v
        .parquet(dataDir(name).resolve(s"v$v").toString)
      obs.get("n").asInstanceOf[Long]
    }
    Files.write(manifestPath(name, v),
      (dirs.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    n
  }

  /** The swap half: make `v` the committed version. Atomic rename — a
    * reader sees the old pointer or the new one, never a torn write. */
  private[graft] def swapTo(name: String, v: Long): Unit = {
    val tmp = metaDir(name).resolve("_current.tmp")
    Files.write(tmp, s"$v\n".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Full-replace commit → new version containing only `df`. Returns the
    * new version number. */
  def commitOverwrite(name: String, df: DataFrame): Long = {
    val v = currentVersion(name) + 1
    stage(name, v, Some(df), Seq(s"v$v"))
    swapTo(name, v)
    v
  }

  /** Append commit → new version = previous snapshot's file sets plus the
    * batch's; nothing existing is rewritten. */
  def commitAppend(name: String, df: DataFrame): Long = {
    val cur = currentVersion(name)
    require(cur >= 1, s"'$name' has no committed version to append to — " +
      "use commitOverwrite for the first commit")
    val v = cur + 1
    stage(name, v, Some(df), readManifest(name, cur) :+ s"v$v")
    // a keyed table's zone stats survive the append (the new dir simply
    // has no rows in them, so CoW merges rewrite it conservatively —
    // the statless branch in commitMergeCow)
    val z = zonesDir(name, cur)
    if (Files.exists(z))
      org.apache.commons.io.FileUtils
        .copyDirectory(z.toFile, zonesDir(name, v).toFile)
    swapTo(name, v)
    v
  }

  /** MERGE as a versioned commit: apply a CdcOps.snapshotDiff change set
    * (insert/update/delete per key) to the current snapshot and commit
    * the result as a NEW version. Because the write lands in a fresh data
    * dir, the merge READS the current version's files while writing the
    * next — no tmp-promote dance, no read-write conflict — and a bad
    * merge is one metadata-only [[rollback]] away (the x141b contract).
    * Copy-on-write at whole-snapshot granularity — the stats-free path
    * for small/reference tables; [[commitMergeCow]] is the file-level
    * refinement that rewrites only the files touched keys intersect. */
  def commitMerge(name: String, key: String, diff: DataFrame): Long =
    commitOverwrite(name,
      graft.ops.CdcOps.applyDiff(readCurrent(name), diff, key))

  /** Roll back to snapshot `v` as a NEW version (metadata-only: its
    * manifest is copied; no data is written, moved, or deleted — the
    * rolled-past versions remain readable and auditable). A keyed
    * version's zone stats are carried forward so copy-on-write merges
    * keep pruning after the rollback. */
  def rollback(name: String, v: Long): Long = {
    val target = readManifest(name, v) // validates v
    val nv = currentVersion(name) + 1
    stage(name, nv, None, target)
    val z = zonesDir(name, v)
    if (Files.exists(z))
      org.apache.commons.io.FileUtils
        .copyDirectory(z.toFile, zonesDir(name, nv).toFile)
    swapTo(name, nv)
    nv
  }

  // --- keyed layout + file-level copy-on-write ---------------------------

  private def zonesDir(name: String, v: Long): Path =
    tableDir(name).resolve("zones").resolve(s"v$v")

  /** Per-file (f, lo, hi) key ranges of the files just written under
    * `data/<dir>` — ONE readback scan at commit time (the zone-map
    * refresh cost TableStore pays too), stored as a tiny spark-written
    * parquet so lo/hi keep the key's real type. Only files that HOLD
    * rows appear (empty range-buckets never enter the manifest). */
  private def writeZones(name: String, v: Long, dir: String,
                         key: String): Unit = {
    import org.apache.spark.sql.functions._
    val prefix = dataDir(name).toString + "/"
    val full = spark.read.parquet(escapeGlob(
        dataDir(name).resolve(dir).toString))
      .groupBy(input_file_name().as("f"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"))
      // Column ops, not an interpolated expr: the path must never be
      // parsed as SQL text (the constructor guard refuses roots whose
      // characters would URI-encode inside input_file_name)
      .withColumn("f", col("f").substr(
        locate(prefix, col("f")) + lit(prefix.length), lit(1 << 30)))
    full.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(zonesDir(name, v).toString)
  }

  private def zoneFiles(zones: DataFrame): Seq[String] =
    zones.select("f").collect().map(_.getString(0)).toSeq.sorted

  private def readZones(name: String, v: Long): Option[DataFrame] = {
    val z = zonesDir(name, v)
    if (Files.exists(z)) Some(spark.read.parquet(escapeGlob(z.toString)))
    else None
  }

  /** Full-replace commit range-clustered on `key` with per-file zone
    * stats — the layout [[commitMergeCow]] prunes against. `numFiles`
    * range buckets ⇒ tight, non-overlapping per-file key ranges. The
    * manifest lists FILES (not the dir), so a later CoW merge can carry
    * individual untouched files forward by reference. */
  def commitOverwriteKeyed(name: String, key: String, df: DataFrame,
                           numFiles: Int = 16): Long = {
    import org.apache.spark.sql.functions.col
    val v = currentVersion(name) + 1
    stage(name, v, Some(df.repartitionByRange(numFiles, col(key))),
      Seq(s"v$v"))
    writeZones(name, v, s"v$v", key)
    // re-stage the manifest at FILE granularity now the file set is known
    // (the pointer hasn't swapped; nothing was visible in between). An
    // EMPTY commit has no zone rows — keep the dir entry (Spark's empty
    // write is schema-bearing) so the version stays readable.
    val files = zoneFiles(readZones(name, v).get)
    stage(name, v, None, if (files.isEmpty) Seq(s"v$v") else files)
    swapTo(name, v)
    v
  }

  /** Files of version `v` that can hold a key in [from, to], per the zone
    * stats, split (chosen, skipped). Manifest entries without zone rows
    * are conservatively chosen. Spec seam for the skipping claim. */
  private[graft] def pruneFiles(name: String, v: Long, key: String,
      from: Any, to: Any): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.functions._
    val entries = readManifest(name, v)
    readZones(name, v) match {
      case None => (entries, Nil)
      case Some(z) =>
        val inRange = z.filter(col("hi") >= lit(from) && col("lo") <= lit(to))
        val chosen = zoneFiles(inRange).toSet
        val known = zoneFiles(z).toSet
        val pick = entries.filter(e => chosen(e) || !known(e))
        (pick, entries.filterNot(pick.contains))
    }
  }

  /** Zone-pruned range read of a keyed snapshot — TableStore.skippingRead
    * for versioned tables: only files whose key range intersects
    * [from, to] are OPENED (the rest are never listed into the scan);
    * the residual filter still applies, so the result is exact. Falls
    * back to a filtered full read when `v` has no zone stats. */
  def readVersionWhere(name: String, v: Long, key: String,
                       from: Any, to: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    val (pick, _) = pruneFiles(name, v, key, from, to)
    readEntries(name, pick, readVersion(name, v))
      .filter(col(key) >= lit(from) && col(key) <= lit(to))
  }

  /** Compact the CURRENT snapshot into `numFiles` fresh range-clustered
    * files as a NEW version — pays down the small-file debt appends and
    * CoW merges accumulate, without losing history (old versions still
    * reference the old files; [[expireVersions]] + [[vacuum]] reclaim
    * them once the history window moves past). */
  def compactKeyed(name: String, key: String, numFiles: Int = 16): Long =
    commitOverwriteKeyed(name, key, readCurrent(name), numFiles)

  /** File-level copy-on-write MERGE — the 100 TB refinement
    * [[commitMerge]]'s scaladoc points at: only files whose zone range
    * intersects a touched key are rewritten; every other file is carried
    * into the new manifest BY REFERENCE (zero bytes moved). Cost is
    * O(touched files + changes), not O(table) — the spec pins both the
    * reuse and the content parity with the full-rewrite merge. Files
    * without zone stats (e.g. from a plain commitAppend) are
    * conservatively treated as always-touched. Returns (new version,
    * files reused untouched). */
  def commitMergeCow(name: String, key: String,
                     diff: DataFrame): (Long, Int) = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(name)
    require(cur >= 1, s"'$name' has no committed version to merge into")
    val entries = readManifest(name, cur)
    val zones = readZones(name, cur).getOrElse(
      throw new IllegalArgumentException(
        s"'$name' v$cur has no zone stats — commitOverwriteKeyed first " +
          "(commitMerge is the stats-free full-rewrite path)"))
    // every change type touches its key's file: deletes/updates must
    // rewrite it, inserts of an in-range key must land beside it so the
    // per-file ranges stay disjoint
    val touchedKeys = diff.select(col(key)).distinct()
    val touchedFiles = zones.as("z")
      .join(touchedKeys.as("t"),
        col(s"t.$key") >= col("z.lo") && col(s"t.$key") <= col("z.hi"),
        "left_semi")
      .select("f").collect().map(_.getString(0)).toSet
    // entries without zone rows (a plain commitAppend's dir, say) are
    // conservatively always-rewritten — pruning needs stats to be sound
    val statless = entries.toSet -- zoneFiles(zones).toSet
    val rewrite = (touchedFiles ++ statless).filter(entries.contains)
    val reused = entries.filterNot(rewrite)
    val v = cur + 1
    val base = readEntries(name, rewrite.toSeq, readVersion(name, cur))
    val merged = graft.ops.CdcOps.applyDiff(base, diff, key)
    stage(name, v, Some(merged.repartitionByRange(
        math.max(1, rewrite.size), col(key))), Seq(s"v$v"))
    writeZones(name, v, s"v$v", key)
    // final zones = the new dir's rows ∪ the reused files' carried rows;
    // checkpoint before overwriting the dir the new rows were read from.
    // Ranges MAY overlap across files after a merge (an insert beyond
    // every range lands in the new dir whose span can straddle reused
    // files') — harmless for pruning soundness, it only widens future
    // touch sets.
    val newZoneRows = readZones(name, v).get.localCheckpoint()
    val newFiles = zoneFiles(newZoneRows)
    newZoneRows.unionByName(zones.filter(col("f").isin(reused: _*)))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(zonesDir(name, v).toString)
    graft.ops.RelOps.releaseCheckpoint(newZoneRows)
    // file-granular manifest: untouched files by reference + the new set.
    // A merge that deleted everything has no new files AND no reused
    // ones — keep the (schema-bearing, empty) dir so the version reads.
    val entriesOut =
      if (reused.isEmpty && newFiles.isEmpty) Seq(s"v$v")
      else reused ++ newFiles
    stage(name, v, None, entriesOut)
    swapTo(name, v)
    (v, reused.size)
  }

  /** Delete data dirs referenced by NO committed manifest — failed-commit
    * leftovers. A manifest entry may be a dir OR a file inside one
    * (keyed/CoW commits reference files), so a dir survives when ANY
    * entry lives under it. Orphaned zone-stats dirs (uncommitted
    * versions) are swept too. Returns the dirs removed. Safe under the
    * single-writer contract: an uncommitted stage is by definition
    * abandoned. */
  def vacuum(name: String): Seq[String] = {
    val referencedDirs = versions(name).flatMap(readManifest(name, _))
      .map(_.split("/", 2)(0)).toSet
    val dd = dataDir(name)
    if (!Files.exists(dd)) return Nil
    val stream = Files.list(dd)
    val orphans =
      try stream.iterator().asScala.toList
        .filter(p => !referencedDirs.contains(p.getFileName.toString))
      finally stream.close()
    orphans.foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
    val zd = tableDir(name).resolve("zones")
    if (Files.exists(zd)) {
      val live = versions(name).map(v => s"v$v").toSet
      val zs = Files.list(zd)
      try zs.iterator().asScala.toList
        .filter(p => !live.contains(p.getFileName.toString))
        .foreach(p =>
          org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
      finally zs.close()
    }
    orphans.map(_.getFileName.toString).sorted
  }
}
