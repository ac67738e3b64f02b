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
}
