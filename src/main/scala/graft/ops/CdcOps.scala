package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture operators: diff two keyed snapshots into a typed
  * change set, and apply a change set as a MERGE. The lakehouse
  * ingest/compaction primitives — at 100 TB the diff is one co-partitioned
  * full-outer shuffle join on the key (AQE handles skewed keys), and apply
  * is anti-join + union; a table format (Delta/Iceberg) would add file-level
  * pruning of untouched partitions on top of exactly these semantics.
  */
object CdcOps {

  /** Key-level diff of two snapshots. Inputs must be keyed, deduplicated
    * frames; `cmpCols` are the payload columns whose change constitutes an
    * UPDATE. Output: (key, change_type ∈ insert|delete|update|unchanged,
    * old_v struct, new_v struct). The payloads ride as single structs so
    * the comparison is one vectorized struct-equality, and apply can
    * reconstruct full rows from `new_v` without re-reading the source. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      cmpCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(col(key), struct(cmpCols.map(col): _*).as("old_v"))
    val n = newSnap.select(col(key), struct(cmpCols.map(col): _*).as("new_v"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("old_v").isNull, "insert")
          .when(col("new_v").isNull, "delete")
          .when(col("old_v") =!= col("new_v"), "update")
          .otherwise("unchanged").as("change_type"),
        col("old_v"), col("new_v"))
  }

  /** MERGE a snapshotDiff change set into `base` (which must project
    * exactly key + the diff's cmpCols): delete/update keys are anti-joined
    * away, then insert/update rows are appended from `new_v`. Applying the
    * diff of (A, B) onto A reproduces B exactly — CdcOpsSpec pins that
    * round trip, and x106's oracle re-derives B independently. */
  def applyDiff(base: DataFrame, diff: DataFrame, key: String): DataFrame = {
    val removed = diff
      .filter(col("change_type").isin("delete", "update"))
      .select(col(key))
    val appended = diff
      .filter(col("change_type").isin("insert", "update"))
      .select(col(key), col("new_v.*"))
    base.join(removed, Seq(key), "left_anti").unionByName(appended)
  }

  /** Partition values the change set touches. `partCol` must ride inside
    * the diff's payload structs (include it in snapshotDiff's cmpCols —
    * a partition value derived from the key never flips an UPDATE).
    * Driver-side collect is bounded by the table's PARTITION count (a
    * layout property, thousands at most), never by row count. */
  def touchedPartitions(diff: DataFrame, partCol: String): Seq[Any] =
    diff.filter(col("change_type") =!= "unchanged")
      .select(coalesce(col(s"new_v.$partCol"), col(s"old_v.$partCol")).as("p"))
      .distinct().collect().map(_.get(0)).toSeq

  /** MERGE into a partitioned parquet table rewriting ONLY the partitions
    * the change set touches — the file-level pruning a table format
    * (Delta/Iceberg) layers on the same semantics, expressed with vanilla
    * partitioned parquet + dynamic partition overwrite. At 100 TB this is
    * the difference between rewriting the table per merge and rewriting
    * the few partitions that changed:
    *   1. derive touched partition values from the diff (small);
    *   2. scan base WITH a partition filter (untouched partitions are
    *      pruned at planning — CdcOpsSpec asserts PartitionFilters and
    *      that untouched partition files are byte-identical after apply);
    *   3. merge (anti-join + union) within the touched rows only;
    *   4. dynamic-overwrite: only partitions present in the merged output
    *      are replaced.
    * Returns the touched-partition values (for audit/logging). */
  def applyDiffToPartitionedTable(tableDir: String, diff: DataFrame,
      key: String, partCol: String): Seq[Any] = {
    val spark = diff.sparkSession
    val touched = touchedPartitions(diff, partCol)
    if (touched.nonEmpty) {
      val base = spark.read.parquet(tableDir)
        .filter(col(partCol).isin(touched: _*))
      val changes = diff.filter(col(s"new_v.$partCol").isin(touched: _*) ||
        col(s"old_v.$partCol").isin(touched: _*))
      val merged = applyDiff(base, changes, key)
      // Dynamic overwrite only replaces partitions PRESENT in the output —
      // a touched partition whose rows were all deleted produces no output
      // and would keep its stale files. Find those up front (one pruned
      // pass over the merged rows) and drop their directories explicitly.
      val survivors = merged.select(col(partCol)).distinct()
        .collect().map(_.get(0)).toSet
      val emptied = touched.filterNot(survivors.contains)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try merged.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      if (emptied.nonEmpty) {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
        emptied.foreach { v =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$partCol=$v"), true)
        }
      }
    }
    touched
  }
}
