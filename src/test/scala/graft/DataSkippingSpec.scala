package graft

import org.apache.spark.sql.functions._
import graft.sources.TableStore

/** File-level data skipping: clustered layout → min/max manifest → pruned
  * range reads. Pins the two claims that matter: the pruned read touches
  * FEWER files than the table holds, and returns exactly the rows the
  * full-scan filter returns. */
class DataSkippingSpec extends SparkSpec {

  import spark.implicits._

  test("skippingRead prunes files on a clustered table and matches the " +
      "full-scan filter exactly") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("orders_c",
      env.orders.select("o_orderkey", "o_totalprice"),
      "o_totalprice", numFiles = 8)
    val manifest = store.buildManifest("orders_c", "o_totalprice")
    assert(manifest.count() === 8) // one zone row per file
    // zones are selective: clustered files cover disjoint-ish ranges
    val full = store.read("orders_c")
    val (lo, hi) = (100000.0, 150000.0)
    val pruned = store.skippingRead("orders_c", "o_totalprice", lo, hi)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no files skipped: ${pruned.inputFiles.length} of ${full.inputFiles.length}")
    val got = pruned.select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = full.filter(col("o_totalprice").between(lo, hi))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("refreshManifest adds zones for appended files only; skippingRead " +
      "sees appended rows") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store3_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("t3",
      env.orders.select("o_orderkey", "o_totalprice").filter(col("o_orderkey") < 1000),
      "o_totalprice", numFiles = 4)
    store.buildManifest("t3", "o_totalprice")
    val before = store.read("t3__manifest_o_totalprice")
      .collect().map(_.toSeq).toSet
    // keyed append lands new rows in NEW files
    store.appendKeyed("t3", "o_orderkey",
      env.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1100))
    val added = store.refreshManifest("t3", "o_totalprice")
    assert(added > 0)
    val after = store.read("t3__manifest_o_totalprice")
      .collect().map(_.toSeq).toSet
    // old zones byte-identical, new zones appended
    assert(before.subsetOf(after) && after.size === before.size + added)
    // a second refresh is a no-op
    assert(store.refreshManifest("t3", "o_totalprice") === 0L)
    // pruned read over the whole range now covers appended rows too
    val all = store.skippingRead("t3", "o_totalprice", 0.0, 1e9)
      .count()
    assert(all === store.read("t3").count())
  }

  test("refreshManifest survives a full rewrite: dead zones dropped, new " +
      "zones added, pruned reads stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store4_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("t4",
      env.orders.select("o_orderkey", "o_totalprice"),
      "o_totalprice", numFiles = 6)
    store.buildManifest("t4", "o_totalprice")
    // compaction replaces EVERY file: all manifest zones go dead at once —
    // the branch that must not read the manifest while overwriting it
    store.compact("t4", numFiles = 2)
    val added = store.refreshManifest("t4", "o_totalprice")
    assert(added === 2) // one zone per compacted file
    val manifest = store.read("t4__manifest_o_totalprice")
    assert(manifest.count() === 2) // dead zones gone, only live files remain
    val live = store.read("t4").inputFiles.map(_.replaceAll("^file:/+", "/")).toSet
    // every manifest entry points at a live file (decoded comparison)
    val manifested = manifest.select("file").collect()
      .map(r => graft.ops.CdcOps.unescapePathName(r.getString(0))
        .replaceAll("^file:/+", "/")).toSet
    assert(manifested === live)
    // pruned read on the post-compaction manifest is still exact
    val (lo, hi) = (100000.0, 150000.0)
    val got = store.skippingRead("t4", "o_totalprice", lo, hi)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = store.read("t4").filter(col("o_totalprice").between(lo, hi))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
  }

  test("skippingRead outside every zone returns empty without failing") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store2_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("orders_c2",
      env.orders.select("o_orderkey", "o_totalprice"),
      "o_totalprice", numFiles = 4)
    store.buildManifest("orders_c2", "o_totalprice")
    assert(store.skippingRead("orders_c2", "o_totalprice",
      -2.0, -1.0).count() === 0)
  }
}
