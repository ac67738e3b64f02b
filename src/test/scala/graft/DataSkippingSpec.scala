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

  test("multi-column zonemap: a 2-predicate read skips more files than " +
      "either predicate alone; refresh maintains every column's zones") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store5_")
    val store = new TableStore(spark, dir.toString)
    // two correlated columns (k2 = key + 1000): range-clustering on the
    // key makes BOTH columns' zones narrow, so each predicate prunes
    val df = env.orders.select("o_orderkey", "o_totalprice")
      .withColumn("k2", col("o_orderkey") + 1000)
    store.overwriteClustered("t5", df, "o_orderkey", numFiles = 8)
    val manifest = store.buildManifestMulti("t5",
      Seq("o_orderkey", "k2", "o_totalprice"))
    assert(manifest.count() === 8)
    assert(manifest.columns.toSet === Set("file", "n_rows",
      "min_o_orderkey", "max_o_orderkey", "min_k2", "max_k2",
      "min_o_totalprice", "max_o_totalprice"))
    val maxKey = df.agg(max("o_orderkey")).head.getLong(0)
    // predicate A: first ~quarter of keys; predicate B: keys shifted by
    // 1000 covering the second ~quarter — the conjunction intersects in
    // a sliver around the quarter boundary
    val pA: (String, Any, Any) = ("o_orderkey", 0L, maxKey / 4)
    val pB: (String, Any, Any) = ("k2", maxKey / 5 + 1000, maxKey / 2 + 1000)
    val both = store.skippingReadMulti("t5", Seq(pA, pB))
    val onlyA = store.skippingReadMulti("t5", Seq(pA))
    val onlyB = store.skippingReadMulti("t5", Seq(pB))
    val total = store.read("t5").inputFiles.length
    assert(both.inputFiles.length < math.min(onlyA.inputFiles.length,
      onlyB.inputFiles.length))
    assert(onlyA.inputFiles.length < total && onlyB.inputFiles.length < total)
    // result equality with the full-scan conjunction
    val got = both.select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = store.read("t5")
      .filter(col("o_orderkey").between(0, maxKey / 4) &&
        col("k2").between(maxKey / 5 + 1000, maxKey / 2 + 1000))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
    // incremental refresh covers appended files for EVERY column
    store.appendKeyed("t5", "o_orderkey",
      df.filter(col("o_orderkey") > maxKey - 100)
        .withColumn("o_orderkey", col("o_orderkey") + maxKey))
    val added = store.refreshManifestMulti("t5",
      Seq("o_orderkey", "k2", "o_totalprice"))
    assert(added > 0)
    val allRows = store.skippingReadMulti("t5",
      Seq(("o_orderkey", 0L, 10L * maxKey))).count()
    assert(allRows === store.read("t5").count())
  }

  test("z-order layout: a range predicate on EITHER clustered column " +
      "prunes files; linear clustering prunes only its own column") {
    val dir = java.nio.file.Files.createTempDirectory("skip_zorder_")
    val store = new TableStore(spark, dir.toString)
    // o_orderkey and o_totalprice are statistically independent — the
    // case where a single-column sort cannot help the other predicate
    val df = env.orders.select("o_orderkey", "o_totalprice")
    store.overwriteClustered("lin", df, "o_totalprice", numFiles = 16)
    store.overwriteZordered("zord", df, Seq("o_totalprice", "o_orderkey"),
      numFiles = 16)
    store.buildManifestMulti("lin", Seq("o_totalprice", "o_orderkey"))
    store.buildManifestMulti("zord", Seq("o_totalprice", "o_orderkey"))
    val total = store.read("zord").inputFiles.length
    assert(total === 16)
    val maxKey = df.agg(max("o_orderkey")).head.getLong(0)
    // predicate on the column the LINEAR table is NOT clustered by
    val pKey: (String, Any, Any) = ("o_orderkey", 0L, maxKey / 8)
    // linear-on-price files each span ~the full key range: nothing skips
    assert(store.skippingReadMulti("lin", Seq(pKey)).inputFiles.length
      === store.read("lin").inputFiles.length)
    // z-ordered files own key×price hypercubes: most files skip on a
    // 1/8-of-domain key slab (z-curve bound: ~sqrt fraction touched)
    val zKeyFiles = store.skippingReadMulti("zord", Seq(pKey)).inputFiles.length
    assert(zKeyFiles * 2 <= total, s"key predicate read $zKeyFiles of $total")
    // the price predicate still prunes the z table too (both columns win)
    val pPrice: (String, Any, Any) = ("o_totalprice", 100000.0, 150000.0)
    val zPriceFiles = store.skippingReadMulti("zord", Seq(pPrice)).inputFiles.length
    assert(zPriceFiles < total, s"price predicate read $zPriceFiles of $total")
    // exactness: conjunctive pruned read ≡ full-scan conjunctive filter
    val got = store.skippingReadMulti("zord", Seq(pKey, pPrice))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = store.read("zord")
      .filter(col("o_orderkey").between(0L, maxKey / 8) &&
        col("o_totalprice").between(100000.0, 150000.0))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
    // the rewrite loses no rows
    assert(store.read("zord").count() === df.count())
  }

  test("skippingRead resolves manifest entries literally under a store " +
      "root containing glob metacharacters") {
    val base = java.nio.file.Files.createTempDirectory("skip_glob_")
    // a root like .../v[1]{2}/ — every manifest 'file' string then
    // contains characters Hadoop's glob expansion would interpret
    val dir = base.resolve("v[1]{2}")
    java.nio.file.Files.createDirectories(dir)
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("tg",
      env.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") % 2 === 0),
      "o_totalprice", numFiles = 4)
    store.buildManifest("tg", "o_totalprice")
    val (lo, hi) = (0.0, 1e9)
    val got = store.skippingRead("tg", "o_totalprice", lo, hi).count()
    assert(got === store.read("tg").count() && got > 0)
    // incremental refresh also feeds new-file paths through a read
    store.appendKeyed("tg", "o_orderkey",
      env.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") % 2 === 1).limit(50))
    assert(store.refreshManifest("tg", "o_totalprice") > 0)
    assert(store.skippingRead("tg", "o_totalprice", lo, hi).count()
      === store.read("tg").count())
  }

  test("maxFileList bounds the driver-side file list: over the cap the " +
      "read falls back to the plain scan and stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("skip_cap_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("tc",
      env.orders.select("o_orderkey", "o_totalprice"),
      "o_totalprice", numFiles = 8)
    store.buildManifest("tc", "o_totalprice")
    val (lo, hi) = (100000.0, 150000.0)
    val want = store.read("tc")
      .filter(col("o_totalprice").between(lo, hi))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    // cap below the surviving-zone count: the driver collects at most
    // cap+1 paths (here 2), then reads the whole table — every file —
    // and the exact predicate does the filtering
    val fallback = store.skippingRead("tc", "o_totalprice", lo, hi,
      maxFileList = 1)
    assert(fallback.inputFiles.length === store.read("tc").inputFiles.length)
    assert(fallback.select("o_orderkey").as[Long].collect().sorted.toSeq
      === want)
    // cap above it: the literal pruned list engages and skips files
    val pruned = store.skippingRead("tc", "o_totalprice", lo, hi,
      maxFileList = 100)
    assert(pruned.inputFiles.length < store.read("tc").inputFiles.length)
    assert(pruned.select("o_orderkey").as[Long].collect().sorted.toSeq
      === want)
    // same contract on the multi-column path
    store.buildManifestMulti("tc", Seq("o_totalprice"))
    val multiFallback = store.skippingReadMulti("tc",
      Seq(("o_totalprice", lo, hi)), maxFileList = 1)
    assert(multiFallback.inputFiles.length
      === store.read("tc").inputFiles.length)
    assert(multiFallback.select("o_orderkey").as[Long].collect().sorted.toSeq
      === want)
  }

  test("statsOnlyAggregate answers count/min/max from the manifest alone " +
      "and matches the full scan") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store_soa_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("t",
      env.orders.select("o_orderkey", "o_totalprice"),
      "o_totalprice", numFiles = 8)
    store.buildManifestMulti("t", Seq("o_orderkey", "o_totalprice"))
    val got = store.statsOnlyAggregate("t", Seq("o_orderkey", "o_totalprice"))
    // the aggregate's scan reads ONLY the zonemap table, never 't' data
    val scanned = got.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.take(3)).mkString("\n")
    assert(got.inputFiles.forall(_.contains("__zonemap")),
      s"stats aggregate must scan only the manifest, saw: $scanned")
    val want = store.read("t").agg(
      count(lit(1)).as("n_rows"),
      min("o_orderkey").as("min_o_orderkey"),
      max("o_orderkey").as("max_o_orderkey"),
      min("o_totalprice").as("min_o_totalprice"),
      max("o_totalprice").as("max_o_totalprice")).collect()(0)
    val g = got.collect()(0)
    assert(g.getAs[Long]("n_rows") === want.getAs[Long]("n_rows"))
    assert(g.getAs[Long]("min_o_orderkey") === want.getAs[Long]("min_o_orderkey"))
    assert(g.getAs[Long]("max_o_orderkey") === want.getAs[Long]("max_o_orderkey"))
    assert(g.getAs[Double]("min_o_totalprice") === want.getAs[Double]("min_o_totalprice"))
    assert(g.getAs[Double]("max_o_totalprice") === want.getAs[Double]("max_o_totalprice"))
  }

  test("statsOnlyAggregate fails loudly on a stale manifest; refresh heals") {
    val dir = java.nio.file.Files.createTempDirectory("skip_store_soa2_")
    val store = new TableStore(spark, dir.toString)
    store.overwriteClustered("t",
      env.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") < 1000),
      "o_totalprice", numFiles = 4)
    store.buildManifestMulti("t", Seq("o_orderkey"))
    val before = store.statsOnlyAggregate("t", Seq("o_orderkey")).collect()(0)
    store.append("t",
      env.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000))
    // unmanifested files → the gate must refuse, not silently answer stale
    val e = intercept[IllegalArgumentException] {
      store.statsOnlyAggregate("t", Seq("o_orderkey"))
    }
    assert(e.getMessage.contains("stale"))
    store.refreshManifestMulti("t", Seq("o_orderkey"))
    val after = store.statsOnlyAggregate("t", Seq("o_orderkey")).collect()(0)
    assert(after.getAs[Long]("n_rows") > before.getAs[Long]("n_rows"))
    assert(after.getAs[Long]("max_o_orderkey") >= 1000L)
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
