package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.col
import graft.ops.RelOps

/** Parquet-backed table namespace — the engine's stand-in for the
  * reference's DuckDB and PostgreSQL stores (SURVEY §2.1 S5-S9).
  *
  * Scale posture: tables are directories of parquet files; appends add
  * files (no rewrite); the keyed append's anti-join is the documented S6
  * formulation (at 100 TB: partition/bucket by key and let AQE broadcast
  * the incoming batch; a MERGE-capable format would subsume this). The
  * read-dedup-write sequence is not transactional — single-writer
  * semantics, matching the reference's concurrency=1 (W11).
  */
final class TableStore(spark: SparkSession, root: String) {

  Files.createDirectories(Paths.get(root))

  def path(name: String): String = s"$root/$name"

  def exists(name: String): Boolean = {
    val p = Paths.get(path(name))
    if (!Files.exists(p)) return false
    val stream = Files.list(p)
    try stream.findFirst().isPresent finally stream.close()
  }

  /** S5 (etl_elt_wine.py:126-145): CREATE TABLE IF NOT EXISTS with declared
    * schema. PK uniqueness is not engine-enforced (as in Spark generally) —
    * appendKeyed provides it by construction. */
  def createIfNotExists(name: String, schema: StructType): Unit =
    if (!exists(name)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(path(name))
    }

  /** S9 (utils.py:51-67): table read. The store root is glob-escaped:
    * Spark glob-expands every read path, so an UNescaped root containing
    * [ ] { } * ? would resolve to the wrong directory (or nothing) on
    * every read — writes are unaffected (save() does not glob). */
  def read(name: String): DataFrame = spark.read.parquet(escapeGlob(path(name)))

  /** S6 (etl_elt_wine.py:214-217): idempotent keyed append — INSERT OR
    * IGNORE BY NAME semantics; keeps existing rows on key conflict.
    * Returns the number of rows actually appended (the reference logs and
    * XComs this row count). */
  def appendKeyed(name: String, key: String, incoming: DataFrame): Long = {
    val existing = read(name)
    // localCheckpoint (not cache): the write appends files into the same
    // directory the anti-join's lineage lists, so a lost cache block that
    // triggered recomputation mid-write could re-list the directory being
    // appended. Checkpointing severs the lineage entirely.
    val fresh = RelOps.newRowsOnly(existing, key)(incoming).localCheckpoint()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode(SaveMode.Append).parquet(path(name))
      n
    } finally RelOps.releaseCheckpoint(fresh)
  }

  /** Raw append: new files land next to the existing ones, no key
    * filtering — for callers that pre-filter (SimilarityOps'
    * appendMinhashBatch anti-joins on doc id BEFORE computing rows, and
    * needs multiple rows per key, which appendKeyed's per-key dedup
    * would drop). The frame must be pinned/materialized by the caller if
    * its lineage reads this same table. */
  def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  /** MERGE-style keyed upsert: incoming rows replace same-key existing
    * rows, new keys append (the complement of appendKeyed's keep-existing
    * semantics). Rewrites the table — at 100 TB restrict the rewrite to
    * affected partitions or use a MERGE-capable format. */
  def upsertKeyed(name: String, key: String, incoming: DataFrame): Long = {
    val existing = read(name)
    val deduped = incoming.dropDuplicates(key)
    val kept = existing.join(deduped.select(key), Seq(key), "left_anti")
    val merged = kept.unionByName(deduped.select(existing.columns.map(col): _*))
      .cache()
    val n = merged.count()
    // write to a sibling dir then swap — the overwrite would otherwise
    // read-and-clobber its own input
    merged.write.mode(SaveMode.Overwrite).parquet(tmpPath(name))
    merged.unpersist()
    promoteTmp(name)
    n
  }

  /** CDC change application in ONE rewrite: delete `deletes` keys, replace
    * or insert `upserts` rows (upserts must already be one-row-per-key).
    * The single read-merge-swap is what cdcUpsertSink calls per
    * micro-batch — two separate delete + upsert passes would rewrite the
    * table twice. Same 100 TB caveat as upsertKeyed: path-rewrite
    * semantics; at scale route through applyDiffToPartitionedTable or a
    * MERGE-capable format. */
  def applyChanges(name: String, key: String, upserts: DataFrame,
      deletes: DataFrame): Long = {
    val existing = read(name)
    val touched = upserts.select(col(key)).unionByName(deletes.select(col(key)))
      .distinct()
    val kept = existing.join(touched, Seq(key), "left_anti")
    val merged = kept
      .unionByName(upserts.select(existing.columns.map(col): _*))
      .cache()
    val n = merged.count()
    merged.write.mode(SaveMode.Overwrite).parquet(tmpPath(name))
    merged.unpersist()
    promoteTmp(name)
    n
  }

  /** CDC change application that rewrites ONLY the partitions the batch
    * touches — the scale path applyChanges' doc comment promises. At
    * 100 TB a per-batch full rewrite is O(|table|) per micro-batch; this
    * is O(|touched partitions|):
    *   1. touched partition values come from the BATCH (driver collect
    *      bounded by partition count, never row count);
    *   2. the base scan carries a partition filter — untouched partitions
    *      are pruned at planning and their files never open;
    *   3. merge (anti-join + union) runs within touched rows only;
    *   4. dynamic partition overwrite replaces only partitions present in
    *      the output; partitions the batch EMPTIED (all rows deleted) are
    *      dropped explicitly, as in CdcOps.applyDiffToPartitionedTable.
    * Contract: every change row — tombstones included — carries `partCol`,
    * and the partition value of a key is immutable (a partition-moving
    * update needs the old_v-tracking diff path,
    * CdcOps.applyDiffToPartitionedTable). Returns the row count of the
    * touched partitions after the merge (the full-table count would cost
    * a full scan — exactly what this path exists to avoid). */
  def applyChangesPartitioned(name: String, key: String, partCol: String,
      upserts: DataFrame, deletes: DataFrame): Long = {
    // Guard the layout contract up front: called against a table written
    // FLAT (overwrite/overwriteClustered), the dynamic-overwrite
    // partitionBy write below would ADD partCol=... dirs while the old
    // root-level parquet files remain — silently duplicating every
    // untouched row on subsequent reads. Fail fast instead.
    requirePartitionedLayout(name, partCol)
    // pinned: each side feeds touched-derivation, the key anti-join, and
    // (upserts) the union — and the write replaces files their lineage
    // would otherwise re-list
    val up = upserts.localCheckpoint()
    val del = deletes.localCheckpoint()
    try {
      val touched = up.select(col(partCol)).unionByName(del.select(col(partCol)))
        .distinct().collect().map(_.get(0)).toIndexedSeq
      // A NULL partition value would silently vanish from the merge:
      // isin(null) is never true, so the base filter drops the row and
      // the change is lost. The contract (every change row carries
      // partCol) makes NULL a caller bug — reject it loudly.
      require(!touched.contains(null),
        s"applyChangesPartitioned($name): NULL $partCol in change batch — " +
          "every change row (tombstones included) must carry a non-null " +
          "partition value")
      if (touched.isEmpty) return 0L
      val base = read(name).filter(col(partCol).isin(touched: _*))
      val touchedKeys = up.select(col(key)).unionByName(del.select(col(key)))
        .distinct()
      val kept = base.join(touchedKeys, Seq(key), "left_anti")
      val merged = kept.unionByName(up.select(base.columns.map(col): _*))
        .localCheckpoint()
      try {
        val n = merged.count()
        val survivors = merged.select(col(partCol)).distinct()
          .collect().map(r => String.valueOf(r.get(0))).toSet
        val emptied = touched
          .filterNot(v => survivors.contains(String.valueOf(v)))
          .map(String.valueOf)
        val prev =
          spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try merged.write.mode(SaveMode.Overwrite).partitionBy(partCol)
          .parquet(path(name))
        finally prev match {
          case Some(v) =>
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None =>
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        if (emptied.nonEmpty)
          graft.ops.CdcOps.dropPartitionDirs(spark, path(name), partCol,
            emptied.toSet)
        n
      } finally RelOps.releaseCheckpoint(merged)
    } finally {
      RelOps.releaseCheckpoint(up)
      RelOps.releaseCheckpoint(del)
    }
  }

  /** Partitioned-layout guard for the partition-overwrite merge paths:
    * the table root must contain ONLY `partCol=...` directories (hidden
    * files like _SUCCESS aside). One driver-side listing of one directory
    * level — O(partitions), the same bound the touched-partition collect
    * already carries. */
  private def requirePartitionedLayout(name: String, partCol: String): Unit = {
    val dir = path(name)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    require(fs.exists(root),
      s"applyChangesPartitioned($name): table does not exist")
    val prefix = s"$partCol="
    val entries = fs.listStatus(root)
      .filterNot(st => st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith("."))
    val offending = entries.filterNot(st =>
      st.isDirectory && st.getPath.getName.startsWith(prefix))
    require(offending.isEmpty,
      s"applyChangesPartitioned($name): table is not laid out partitioned " +
        s"by $partCol — found non-partition entries " +
        offending.take(3).map(_.getPath.getName).mkString(", ") +
        "; write it with a partitionBy writer first (a dynamic-overwrite " +
        "merge on a flat table would duplicate every untouched row)")
  }

  /** File-level data-skipping manifest: (file, min, max, n_rows) per
    * parquet file for `statsCol` — the min/max zone map a table format
    * (Delta/Iceberg) keeps in its metadata, expressed as one aggregate
    * over `input_file_name()`. Build it ONCE after a clustered write
    * (`overwriteClustered`) and persist it as `<name>__manifest_<col>`;
    * at 100 TB the manifest is thousands of rows where the table is
    * billions, and maintaining it incrementally per written file is the
    * table format's job — this path-based engine rebuilds on rewrite. */
  def buildManifest(name: String, statsCol: String): DataFrame = {
    val m = canonZones(zoneRows(read(name), Seq(statsCol), flat = true))
    overwrite(manifestName(name, statsCol), m)
    read(manifestName(name, statsCol))
  }

  /** Multi-column zone manifest: one row per file carrying min/max for
    * EVERY stats column (`min_<col>`/`max_<col>`) plus the row count —
    * what a table format's per-file column statistics hold. Real tables
    * skip on several columns at once (a date AND a key); the single-col
    * manifest forces a choice. Stored as `<name>__zonemap`; read it back
    * with skippingReadMulti, refresh incrementally with
    * refreshManifestMulti. */
  def buildManifestMulti(name: String, statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "need at least one stats column")
    val m = canonZones(zoneRows(read(name), statsCols, flat = false))
    overwrite(zonemapName(name), m)
    read(zonemapName(name))
  }

  /** Materialize a zones frame driver-side with canonical 'file' paths —
    * input_file_name() percent-encodes and echoes back any glob escapes
    * the scan's input paths carried, so the stored strings must be
    * normalized once at write time or identity comparisons and later
    * literal reads break under glob-metachar roots. Bounded by FILE
    * count (the same cardinality skippingRead collects). */
  private def canonZones(zones: DataFrame): DataFrame = {
    val idx = zones.schema.fieldIndex("file")
    val rows = zones.collect().map { r =>
      org.apache.spark.sql.Row.fromSeq(
        r.toSeq.updated(idx, canonPath(r.getString(idx))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), zones.schema)
  }

  /** Per-file zone aggregation: `flat` keeps the legacy single-column
    * (min_v, max_v) names the x109 surface and specs pin; multi-column
    * zones use min_<col>/max_<col>. */
  private def zoneRows(df: DataFrame, statsCols: Seq[String],
      flat: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit, max, min}
    val aggs = statsCols.flatMap { c =>
      val (mn, mx) = if (flat) ("min_v", "max_v") else (s"min_$c", s"max_$c")
      Seq(min(col(c)).as(mn), max(col(c)).as(mx))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  private def manifestName(name: String, statsCol: String) =
    s"${name}__manifest_$statsCol"

  private def zonemapName(name: String) = s"${name}__zonemap"

  /** Percent-decode a path string (%XX → char). `input_file_name()`
    * URL-encodes paths while `DataFrame.inputFiles` does not, so file
    * identity must be compared on DECODED forms or a store root with a
    * space/percent would make every manifested file look new forever
    * (duplicated zones → double-counted reads). Same decoder family as
    * CdcOps.unescapePathName. */
  private def decodePath(s: String): String = graft.ops.CdcOps.unescapePathName(s)

  /** Hadoop's path resolution glob-expands every path handed to
    * spark.read, so a file list fed back verbatim from a manifest could
    * fail to resolve (or match unintended files) when the store root
    * contains glob metacharacters like [ ] { } * ?. Backslash-escape
    * them so each manifest entry matches exactly one literal file —
    * the same discipline decodePath applies for identity comparison. */
  private def escapeGlob(s: String): String =
    s.replaceAll("([\\\\\\[\\]{}*?])", "\\\\$1")

  /** Canonical on-disk form of a path string produced by
    * input_file_name() or DataFrame.inputFiles: percent-decode, then drop
    * the backslash escapes OUR OWN escapeGlob added to the scan's input
    * paths (Spark echoes them back inside the reported file names).
    * Without this, a manifest refreshed under a glob-metachar store root
    * stores entries like `v\[1\]` that neither match buildManifest's
    * entries nor resolve on disk. */
  private def canonPath(s: String): String =
    decodePath(s).replaceAll("\\\\([\\\\\\[\\]{}*?])", "$1")

  /** Manifest 'file' strings resolve to exactly one literal file:
    * canonicalize, then glob-escape for the read. */
  private def literalPath(s: String): String = escapeGlob(canonPath(s))

  /** Incremental manifest maintenance: compute zones ONLY for files the
    * manifest does not know yet (appendKeyed and streaming sinks add
    * files per batch) and append those rows — the per-commit metadata
    * update a table format performs, without rescanning the manifested
    * files. Zones whose files VANISHED from the table (compaction or a
    * full rewrite replaced them) are dropped in the same pass — a stale
    * zone would feed dead paths to skippingRead's file-list scan. One
    * pruned scan of the new files; surviving manifest rows are untouched
    * (DataSkippingSpec pins both). Returns the number of new file zones
    * added. */
  def refreshManifest(name: String, statsCol: String): Long =
    refreshZones(name, manifestName(name, statsCol), Seq(statsCol),
      flat = true)

  /** Incremental refresh of the multi-column zone manifest — same
    * new-files-only scan / dead-zone drop as refreshManifest, over the
    * wider per-column schema. */
  def refreshManifestMulti(name: String, statsCols: Seq[String]): Long =
    refreshZones(name, zonemapName(name), statsCols, flat = false)

  private def refreshZones(name: String, mName: String,
      statsCols: Seq[String], flat: Boolean): Long = {
    val mDf = read(mName)
    val mSchema = mDf.schema
    val knownRows = mDf.collect()
    val known = knownRows.map(r => canonPath(r.getAs[String]("file"))).toSet
    val allFiles = read(name).inputFiles
    val live = allFiles.map(canonPath).toSet
    val newFiles = allFiles.filterNot(f => known.contains(canonPath(f)))
    val dead = knownRows.filterNot(r =>
      live.contains(canonPath(r.getAs[String]("file"))))
    if (dead.nonEmpty) {
      // rewrite the manifest without the dead zones. Survivors are built
      // from the ALREADY-COLLECTED rows (bounded by file count): a lazy
      // read-filter of mName here would be destroyed by the overwrite,
      // which deletes the very files the scan's lineage lists before the
      // write job reads them (FAILED_READ_FILE.FILE_NOT_EXIST).
      val deadKeys = dead.map(r => canonPath(r.getAs[String]("file"))).toSet
      val survivorRows = knownRows.filterNot(r =>
        deadKeys.contains(canonPath(r.getAs[String]("file"))))
      val survivors = spark.createDataFrame(
        spark.sparkContext.parallelize(survivorRows.toSeq, 1), mSchema)
      overwrite(mName, survivors)
    }
    if (newFiles.isEmpty) 0L
    else {
      // scan paths go out literal (canonical + glob-escaped); the zone
      // rows come back canonicalized before they are stored
      val zones = canonZones(zoneRows(
        spark.read.schema(readSchema(name))
          .parquet(newFiles.map(literalPath).toIndexedSeq: _*),
        statsCols, flat))
      zones.write.mode(SaveMode.Append).parquet(path(mName))
      zones.count()
    }
  }

  /** Range-clustered rewrite: repartitionByRange + sortWithinPartitions on
    * `clusterCol` into `numFiles` files, so each file owns a narrow value
    * range and the manifest's min/max zones become selective. The layout
    * investment that makes skippingRead pay — same trade as bucketing,
    * paid once at write time. */
  def overwriteClustered(name: String, df: DataFrame, clusterCol: String,
      numFiles: Int): Long = {
    val clustered = df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
    overwrite(name, clustered)
  }

  /** Z-order clustered rewrite — the MULTI-column layout investment
    * (Delta OPTIMIZE ZORDER / Iceberg sort-order pattern): each cluster
    * column maps to a 2^bits equi-depth bucket rank (approxQuantile
    * boundaries, so skew cannot collapse buckets), the bucket bits
    * interleave into one space-filling z-value, and the write
    * range-partitions + sorts on it. Files then own small HYPERCUBES of
    * the value space instead of slabs of one column, so a zone-map read
    * filtering on ANY clustered column — not just the leading one —
    * skips most files: with n files over 2 columns a single-column
    * range predicate touches ~sqrt(n) files where a linear clustering
    * on the other column touches all n (DataSkippingSpec pins this).
    *
    * Scale shape: boundaries are one approxQuantile pass collected as a
    * tiny driver array ((2^bits - 1) doubles per column); the bucket-id
    * sum-of-comparisons and the shift/or interleave are pure codegen'd
    * expressions (no UDF, no HOF); the write shuffles ONCE
    * (repartitionByRange on the z-value). Numeric columns only —
    * approxQuantile's domain; NULL ranks into bucket 0. */
  def overwriteZordered(name: String, df: DataFrame, zCols: Seq[String],
      numFiles: Int, bits: Int = 6): Long = {
    val clustered = df
      .withColumn("__z", graft.ops.RelOps.zValueColumn(df, zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    overwrite(name, clustered)
  }

  /** Manifest-pruned range read: select the files whose [min,max] zone
    * intersects [lo,hi] from the manifest (tiny), read ONLY those, then
    * apply the exact predicate. On a range-clustered table this skips the
    * files parquet row-group stats alone cannot — the SCAN never lists
    * them. Falls back to an empty frame when no zone intersects.
    * DataSkippingSpec pins fewer-files-read + result equality with the
    * full-scan filter.
    *
    * Driver-memory bound at 100 TB file counts: the zone FILTER runs
    * distributed (the manifest is a parquet table), and the surviving
    * paths are collected only when there are at most `maxFileList` of
    * them — the regime where an explicit file list beats a directory
    * scan. Past the cap the read degrades to the plain table read plus
    * the exact predicate: Spark's own (distributed, parallel-listing)
    * directory scan with parquet row-group stats doing the intra-file
    * pruning the clustered layout set up — when most zones survive,
    * most files get read either way, so enumerating them buys nothing.
    * Net: driver footprint is O(min(survivors, maxFileList)), strictly
    * below the O(all files) InMemoryFileIndex any plain read already
    * pays; it never balloons with table growth. */
  def skippingRead(name: String, statsCol: String, lo: Any, hi: Any,
      maxFileList: Int = 100000): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val surviving = read(manifestName(name, statsCol))
      .filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select("file")
    prunedScan(name, surviving, maxFileList)
      .filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** Conjunctive manifest-pruned read: keep a file only if EVERY
    * predicate's [lo,hi] range intersects that column's zone — the
    * multi-predicate skip a table format performs against its per-file
    * column stats. Each extra predicate can only shrink the file list
    * (intersection of per-column survivors), so a query filtering on
    * date AND key skips what neither filter alone could. Exact
    * predicates re-apply after the pruned scan, as in skippingRead. */
  def skippingReadMulti(name: String,
      predicates: Seq[(String, Any, Any)],
      maxFileList: Int = 100000): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(predicates.nonEmpty, "need at least one predicate")
    val zoneCond = predicates.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    val surviving = read(zonemapName(name)).filter(zoneCond).select("file")
    predicates.foldLeft(prunedScan(name, surviving, maxFileList)) {
      case (df, (c, lo, hi)) =>
        df.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }

  /** Shared scan builder for the skipping reads: collect the surviving
    * file paths only when there are at most `maxFileList` (the cap is
    * checked by fetching cap+1 paths, so the driver never holds more
    * than that regardless of how many zones survive); otherwise fall
    * back to the plain table read and let the exact predicates prune.
    * Empty survivor set → statically-empty frame, no scan at all. */
  private def prunedScan(name: String, surviving: DataFrame,
      maxFileList: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val probe = surviving.limit(maxFileList + 1)
      .collect().map(r => literalPath(r.getString(0)))
    if (probe.isEmpty) read(name).filter(lit(false))
    else if (probe.length > maxFileList) read(name)
    else spark.read.schema(readSchema(name)).parquet(probe.toIndexedSeq: _*)
  }

  /** X109d: METADATA-only aggregate — count(*)/min/max per stats column
    * answered from the zone manifest ALONE: no data file is opened. This
    * is the table-format fast path (Iceberg's and Delta's stats-based
    * query rewrite) that makes "how many rows, what key range" O(files)
    * instead of O(rows) — at 100 TB the manifest is thousands of rows
    * where the table is billions, so the aggregate is effectively free.
    * Exact by construction: per-file min/max/n_rows come from a full
    * scan at manifest-build time, and sum/min/max compose losslessly
    * (min of file minima = table min; both ignore all-null files the
    * way a direct aggregate ignores null values).
    *
    * Correct ONLY against a fresh manifest, so the file listing (still
    * metadata: read(name).inputFiles, no data IO) is compared against
    * the manifest's file set and a stale manifest fails loudly instead
    * of returning silently wrong numbers — run refreshManifestMulti
    * after appends. */
  def statsOnlyAggregate(name: String, statsCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{max, min, sum}
    require(statsCols.nonEmpty, "need at least one stats column")
    val zones = read(zonemapName(name))
    val known = zones.select("file").collect()
      .map(r => canonPath(r.getString(0))).toSet
    val live = read(name).inputFiles.map(canonPath).toSet
    require(live == known,
      s"zone manifest for '$name' is stale " +
        s"(${(live diff known).size} unmanifested, " +
        s"${(known diff live).size} dead files) — refreshManifestMulti first")
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(s"min_$c")).as(s"min_$c"), max(col(s"max_$c")).as(s"max_$c"))
    } :+ sum(col("n_rows")).as("n_rows")
    zones.agg(aggs.head, aggs.tail: _*)
  }

  private def readSchema(name: String): StructType = read(name).schema

  /** Compaction: rewrite the table's accumulated small files into
    * `numFiles` larger ones (same rows, same schema). Append-style
    * ingestion (appendKeyed, streaming keyedAppendSink) adds files per
    * batch; at 100 TB the listing/open cost of millions of small files
    * dominates scan time, so periodic compaction is a first-class
    * maintenance operator. coalesce (not repartition) merges without a
    * shuffle; the write lands in a sibling dir, then the recoverable
    * swap promotes it. */
  def compact(name: String, numFiles: Int = 1): Long = {
    // layout guards: a blind rewrite would silently destroy physical
    // layout contracts. Bucketed tables (catalog-declared bucket files)
    // cannot be compacted path-wise at all — the catalog would still
    // declare buckets the rewritten filenames no longer encode, and every
    // subsequent spark.table read fails. Partitioned tables keep their
    // directory layout: compaction coalesces within each partition.
    require(!isBucketed(name),
      s"$name is bucketed — re-run overwriteBucketed to compact it " +
        "(bucket files must be rewritten through the catalog)")
    val partCols = partitionColumnsOf(name)
    // partition VALUES must round-trip byte-identically: with type
    // inference on, a string partition like code=01 would be read back as
    // int 1 and rewritten as code=1 (value and type silently changed).
    // Reading them as strings reproduces the exact directory names; later
    // normal reads re-infer types from those unchanged names as before.
    // The toggle lives in a CLONED session (isolated SQLConf, shared
    // SparkContext) so concurrent readers of the shared session never see
    // string-typed partition columns mid-compaction. newSession starts
    // from context defaults, so the caller's RUNTIME-set confs (rebase
    // modes, codecs, …) are copied over first — only the inference key
    // diverges. Static confs reject set() on a live session; skip them.
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s2.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val compacted = s2.read.parquet(escapeGlob(path(name))).coalesce(numFiles)
    val writer = compacted.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmpPath(name))
    promoteTmp(name)
    read(name).count()
  }

  /** True iff the session catalog declares bucketing for a table of this
    * name AT THIS STORE'S PATH — a same-named catalog table living
    * elsewhere (another store's root) must not trip the guard. */
  private def isBucketed(name: String): Boolean =
    spark.catalog.tableExists(name) && {
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
      val meta = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalog.getTableMetadata(ident)
      meta.bucketSpec.nonEmpty &&
        new java.io.File(meta.location).getCanonicalPath ==
          new java.io.File(path(name)).getCanonicalPath
    }

  /** Partition columns from the directory layout, in nesting order —
    * descends `col=value` levels so multi-column layouts
    * (`region=…/day=…`) are preserved, not flattened to the first level. */
  private def partitionColumnsOf(name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    def levels(dir: java.nio.file.Path): Seq[String] = {
      val stream = Files.list(dir)
      val firstPart = try {
        stream.iterator().asScala
          .find(p => Files.isDirectory(p) &&
            p.getFileName.toString.contains("="))
      } finally stream.close()
      firstPart match {
        case Some(p) =>
          p.getFileName.toString.split("=", 2)(0) +: levels(p)
        case None => Nil
      }
    }
    levels(Paths.get(path(name)))
  }

  /** Promote `<table>__tmp` into place. Keeps a recoverable copy at every
    * failure point: old data is moved aside (not deleted) before the new
    * directory takes its place, and only then discarded. */
  private def promoteTmp(name: String): Unit = {
    val target = Paths.get(path(name))
    val old = Paths.get(s"${path(name)}__old")
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile) // stale leftover
    Files.move(target, old)
    Files.move(Paths.get(tmpPath(name)), target)
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }

  private def tmpPath(name: String): String = s"${path(name)}__tmp"

  /** One full-replace implementation for every format/layout variant.
    * The returned row count comes from an Observation riding the write
    * job itself — a read-back count() would re-scan the table just
    * written, a real second pass at 100 TB (the reference re-counts for
    * its XCom row_count; this is the Spark-native version). */
  private def replaceCounted(name: String, df: DataFrame, format: String,
                             partitionCols: Seq[String] = Nil): Long = {
    val obs = org.apache.spark.sql.Observation()
    val w = df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true") // no-op outside csv
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path(name))
    obs.get("n").asInstanceOf[Long]
  }

  /** S7 (etl_elt_wine.py:239-243): full-replace load. */
  def overwrite(name: String, df: DataFrame): Long =
    replaceCounted(name, df, "parquet")

  /** Format-parameterized full-replace load + read-back: parquet is the
    * engine default (columnar, statistics, pushdown), but interchange
    * with external systems wants orc/csv/json too. CSV/JSON reads take
    * the explicit schema (header-only inference is a silent-corruption
    * source at scale — SURVEY §1.2). */
  def overwriteFormat(name: String, df: DataFrame, format: String): Long =
    replaceCounted(name, df, format)

  def readFormat(name: String, format: String, schema: StructType): DataFrame =
    spark.read.format(format).schema(schema).option("header", "true")
      .load(escapeGlob(path(name)))

  /** S7 JDBC variant (etl_elt_wine.py:239-243, the PostgreSQL full-
    * replace load): overwrite a table in an external relational store
    * over JDBC. Tested against embedded Derby (the only DB this
    * zero-egress container ships); against a real server only the url/
    * driver change. */
  def overwriteJdbc(url: String, driver: String, table: String,
                    df: DataFrame): Unit =
    df.write.format("jdbc")
      .option("url", url).option("driver", driver).option("dbtable", table)
      .mode(SaveMode.Overwrite).save()

  /** S8 (etl_elt_wine.py:268-272): pushed-down read from an external DB —
    * filters/projections applied to the returned frame reach the remote
    * engine as SQL (Catalyst JDBC pushdown; PlanSpec asserts
    * PushedFilters on the JDBCRelation scan). Pass `partitioning` for
    * any non-toy table: without it Spark opens ONE connection and reads
    * the whole table in a single task — (column, lower, upper, n) splits
    * the scan into n parallel range queries. */
  def readJdbc(url: String, driver: String, table: String,
               partitioning: Option[(String, Long, Long, Int)] = None,
               fetchSize: Int = 10000): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("driver", driver).option("dbtable", table)
      .option("fetchsize", fetchSize.toString)
    partitioning.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo.toString).option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  /** Partitioned full-replace load — the 100 TB layout: directory
    * partitioning on low-cardinality filter columns so Catalyst prunes
    * non-matching partitions at planning time (scans never open them).
    * PlanSpec-style assertion lives in EtlEltWineSpec. */
  def overwritePartitioned(name: String, df: DataFrame,
                           partitionCols: Seq[String]): Long =
    replaceCounted(name, df, "parquet", partitionCols)

  /** Bucketed full-replace load — the co-located-join layout: rows are
    * hash-bucketed (and sorted) on the join key at WRITE time, so two
    * tables bucketed on the same key with the same bucket count join with
    * NO shuffle exchange (and no sort, if sorted). At 100 TB this turns
    * the recurring fact⋈fact join from the dominant network cost into a
    * local merge per bucket — paid once at load instead of per query.
    * Bucketing metadata lives in the session catalog (saveAsTable), the
    * data under this store's root; read it back with `spark.table(name)`
    * (a plain parquet path read sees files but no bucket spec). */
  def overwriteBucketed(name: String, df: DataFrame, key: String,
                        nBuckets: Int): Long = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path(name))
      .saveAsTable(name)
    spark.table(name).count()
  }

  /** Append a batch to a bucketed table created by [[overwriteBucketed]]
    * (the spec must match the existing table). Each batch adds at most
    * one file per non-empty bucket and the bucket layout survives, so
    * downstream co-located joins stay exchange-free on this side —
    * the ingestion-shaped write an incremental index needs.
    * Returns the rows APPENDED, observed on the write job itself — a
    * post-append table count would scan the ever-growing table on every
    * ingest commit: O(table) per batch on a streaming hot path. */
  def appendBucketed(name: String, df: DataFrame, key: String,
                     nBuckets: Int): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode(SaveMode.Append)
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path(name))
      .saveAsTable(name)
    obs.get("n").asInstanceOf[Long]
  }
}
