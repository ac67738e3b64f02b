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
  *   `<root>/<table>/meta/v<N>`     manifest: the data dirs composing
  *                                  snapshot N (one relative name/line)
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

  /** Every committed version, ascending. Manifests above the pointer
    * (a commit that died pre-swap) are invisible here, as to readers. */
  def versions(name: String): Seq[Long] = 1L to currentVersion(name)

  private def readManifest(name: String, v: Long): Seq[String] = {
    require(v >= 1 && v <= currentVersion(name),
      s"version $v of '$name' does not exist " +
        s"(committed: 1..${currentVersion(name)})")
    Files.readAllLines(manifestPath(name, v), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
  }

  /** Read snapshot `v` — exactly the file sets its manifest lists,
    * regardless of every commit made since. */
  def readVersion(name: String, v: Long): DataFrame = {
    val dirs = readManifest(name, v)
      .map(d => escapeGlob(dataDir(name).resolve(d).toString))
    spark.read.parquet(dirs: _*)
  }

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
    swapTo(name, v)
    v
  }

  /** MERGE as a versioned commit: apply a CdcOps.snapshotDiff change set
    * (insert/update/delete per key) to the current snapshot and commit
    * the result as a NEW version. Because the write lands in a fresh data
    * dir, the merge READS the current version's files while writing the
    * next — no tmp-promote dance, no read-write conflict — and a bad
    * merge is one metadata-only [[rollback]] away (the x141b contract).
    * Copy-on-write at whole-snapshot granularity; at 100 TB the same
    * manifest pattern refines to file-level CoW (rewrite only the files
    * whose zone maps intersect the touched keys — TableStore's skipping
    * machinery supplies exactly that file→key-range index). */
  def commitMerge(name: String, key: String, diff: DataFrame): Long =
    commitOverwrite(name,
      graft.ops.CdcOps.applyDiff(readCurrent(name), diff, key))

  /** Roll back to snapshot `v` as a NEW version (metadata-only: its
    * manifest is copied; no data is written, moved, or deleted — the
    * rolled-past versions remain readable and auditable). */
  def rollback(name: String, v: Long): Long = {
    val target = readManifest(name, v) // validates v
    val nv = currentVersion(name) + 1
    stage(name, nv, None, target)
    swapTo(name, nv)
    nv
  }

  /** Delete data dirs referenced by NO committed manifest — failed-commit
    * leftovers. Returns the dirs removed. Safe under the single-writer
    * contract: an uncommitted stage is by definition abandoned. */
  def vacuum(name: String): Seq[String] = {
    val referenced = versions(name).flatMap(readManifest(name, _)).toSet
    val dd = dataDir(name)
    if (!Files.exists(dd)) return Nil
    val stream = Files.list(dd)
    val orphans =
      try stream.iterator().asScala.toList
        .filter(p => !referenced.contains(p.getFileName.toString))
      finally stream.close()
    orphans.foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
    orphans.map(_.getFileName.toString).sorted
  }
}
