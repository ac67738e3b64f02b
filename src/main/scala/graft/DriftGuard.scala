package graft

import org.apache.spark.sql.SparkSession

/** Testdata-drift tripwire for the driver mains (Verify / Bench).
  *
  * Round 9 lost 14 green queries to a silent misread: regenerated testdata
  * changed events.ts from TIMESTAMP(NANOS) to TIMESTAMP_MICROS and a stale
  * ns→µs shim compressed 30 days of events into ~43 minutes — every hash
  * drifted, nothing crashed. This guard turns that class of failure into a
  * loud, diagnosable error at startup instead of a wall of hash mismatches:
  * the probed invariants (plausible event-time years, lineitem volume near
  * the documented scale curve) hold across testdata regenerations but break
  * under timestamp-unit confusion or a truncated/wrong-scale drop.
  *
  * Cost: one footer read + a min/max over two columns of one row group each
  * — driver-side milliseconds, independent of corpus size.
  */
object DriftGuard {

  /** events.ts must land in a plausible calendar window. A unit-confusion
    * misread (ns read as µs, µs as ms, s as µs) lands min(ts) in 1970 or
    * far future — [2000, 2100] catches every wrong-by-1000x reading while
    * accepting any plausible regenerated timeline. */
  def checkEvents(env: Env): Unit = {
    val r = env.events
      .selectExpr("year(min(ts)) AS y0", "year(max(ts)) AS y1").head()
    require(!r.isNullAt(0),
      s"testdata drift: ${env.dir}/events.parquet has no rows")
    val (y0, y1) = (r.getInt(0), r.getInt(1))
    require(y0 >= 2000 && y1 <= 2100,
      s"testdata drift: events.ts spans years [$y0, $y1], outside the " +
        "plausible [2000, 2100] window — the ts column is being misread " +
        "(timestamp unit confusion?). Re-derive the adaptive read in " +
        "Env.events before trusting any event-family result.")
  }

  /** lineitem row count must sit near the documented scale curve
    * (TESTDATA.md: ~6,000 rows at sf0.001, linear in sf). ±50% tolerates
    * generator variance; a wrong-sf or truncated drop lands far outside. */
  def checkVolume(env: Env): Unit =
    "sf(\\d+(?:\\.\\d+)?)".r.findFirstMatchIn(env.dir).foreach { m =>
      val expected = 6.0e6 * m.group(1).toDouble
      val n = env.lineitem.count()
      require(n >= expected * 0.5 && n <= expected * 1.5,
        f"testdata drift: ${env.dir}/lineitem.parquet has $n%d rows, " +
          f"expected ~${expected}%.0f ±50%% for sf=${m.group(1)} " +
          "(TESTDATA.md scale curve) — wrong or truncated testdata drop.")
    }

  /** embeddings.embedding must keep the documented 64-float geometry —
    * every vector operator (IVF cells, PQ subspaces, ANN hyperplanes,
    * centroid frames) assumes the dimensionality; a regenerated drop with
    * a different dim would not crash most of them, just silently degrade
    * recall contracts. One-row probe. */
  def checkEmbeddings(env: Env): Unit = {
    val r = env.embeddings
      .selectExpr("min(size(embedding)) AS d0", "max(size(embedding)) AS d1")
      .head()
    require(!r.isNullAt(0),
      s"testdata drift: ${env.dir}/embeddings.parquet has no rows")
    require(r.getInt(0) == 64 && r.getInt(1) == 64,
      s"testdata drift: embeddings dims span [${r.getInt(0)}, " +
        s"${r.getInt(1)}], expected uniform 64 — vector-operator " +
        "geometry (IVF/PQ/ANN) no longer matches the corpus.")
  }

  /** Full startup probe; throws IllegalArgumentException on drift. */
  def check(spark: SparkSession, dir: String): Unit = {
    val env = Env(spark, dir)
    checkEvents(env)
    checkVolume(env)
    checkEmbeddings(env)
  }
}
