package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the expectations/Deequ
  * pattern an ingest gate runs before committing a batch: a list of
  * checks compiles into ONE aggregation pass over the table (map-side
  * partials, one scalar reduce — adding a check never adds a scan), and
  * each referential-integrity check is one anti-join. Every check emits
  * (check, metric, passed); failures are reported, never thrown, so the
  * result doubles as the lineage row a pipeline appends per batch.
  *
  * 100 TB notes: all non-distinct metrics are plain conditional counts
  * (codegen'd, partial-aggregated); each Uniqueness check adds a
  * count(DISTINCT ...) and Spark plans k distinct aggregates as one
  * Expand (k× row multiply before the partial agg) — bounded and worth
  * it for exact key checks, but prefer one Uniqueness per suite on wide
  * facts, or approx via the sketch ops when a ±2% answer gates nothing.
  */
object DqOps {

  sealed trait Check { def name: String }

  /** Fraction of non-null values >= minRatio (1.0 = NOT NULL). */
  final case class Completeness(col: String, minRatio: Double = 1.0) extends Check {
    val name = s"completeness($col)"
  }

  /** Distinct tuples / rows >= minRatio (1.0 on a key column = PRIMARY
    * KEY). Columns must be non-null for cross-engine agreement: SQL
    * count(DISTINCT a,b) drops tuples with any NULL field. */
  final case class Uniqueness(cols: Seq[String], minRatio: Double = 1.0) extends Check {
    val name = s"uniqueness(${cols.mkString(",")})"
  }

  /** Fraction of NON-NULL values inside [lo, hi] — pairs with a
    * Completeness check when nulls must also be absent. */
  final case class Bounds(col: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Check {
    val name = s"bounds($col)"
  }

  /** Fraction of non-null values in the allowed set >= minRatio. */
  final case class InSet(col: String, allowed: Seq[String],
      minRatio: Double = 1.0) extends Check {
    val name = s"in_set($col)"
  }

  /** Fraction of non-null values matching the regex >= minRatio. */
  final case class Matches(col: String, regex: String,
      minRatio: Double = 1.0) extends Check {
    val name = s"matches($col)"
  }

  /** Row count within [lo, hi]. */
  final case class RowCount(lo: Long, hi: Long) extends Check {
    val name = "row_count"
  }

  // try_divide: an empty table (or all-null column) yields a NULL metric
  // under ANSI mode instead of a divide-by-zero crash; `passed` then
  // coalesces to false.
  private def ratio(num: Column, den: Column): Column =
    round(try_divide(num.cast("double"), den.cast("double")), 6)

  private final case class Compiled(name: String, metric: Column,
      passed: Column => Column)

  private def compile(c: Check): Compiled = c match {
    case Completeness(cl, r) => Compiled(c.name,
      ratio(count(col(cl)), count(lit(1))), _ >= lit(r))
    case Uniqueness(cols, r) => Compiled(c.name,
      ratio(countDistinct(col(cols.head), cols.tail.map(col): _*),
        count(lit(1))), _ >= lit(r))
    case Bounds(cl, lo, hi, r) => Compiled(c.name,
      ratio(count(when(col(cl).between(lo, hi), 1)), count(col(cl))),
      _ >= lit(r))
    case InSet(cl, allowed, r) => Compiled(c.name,
      ratio(count(when(col(cl).isin(allowed: _*), 1)), count(col(cl))),
      _ >= lit(r))
    case Matches(cl, re, r) => Compiled(c.name,
      ratio(count(when(col(cl).rlike(re), 1)), count(col(cl))),
      _ >= lit(r))
    case RowCount(lo, hi) => Compiled(c.name,
      count(lit(1)).cast("double"), m => m >= lit(lo.toDouble) &&
        m <= lit(hi.toDouble))
  }

  /** Evaluate the suite in one aggregation pass. Returns one row per
    * check: (check, metric DOUBLE, passed BOOLEAN) — on an empty table
    * ratio metrics are NULL and `passed` is false, never null. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val compiled = checks.map(compile)
    val agged = df.agg(compiled.head.metric.as("m0"),
      compiled.tail.zipWithIndex.map { case (cc, i) =>
        cc.metric.as(s"m${i + 1}") }: _*)
    val entries = compiled.zipWithIndex.map { case (cc, i) =>
      struct(lit(cc.name).as("check"),
        col(s"m$i").cast("double").as("metric"),
        coalesce(cc.passed(col(s"m$i")), lit(false)).as("passed"))
    }
    agged.select(explode(array(entries: _*)).as("r")).select("r.*")
  }

  /** Referential integrity: fraction of fact rows with a NON-NULL key
    * present in the dimension (same result schema as runChecks, so the
    * rows union into one report). One left-anti join against the
    * deduplicated key side — broadcast when the dim is small, shuffled
    * otherwise; AQE decides. Null fact keys are Completeness's job. */
  def fkCheck(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val keys = fact.select(col(factKey)).filter(col(factKey).isNotNull)
    val orphans = keys
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    val total = keys.agg(count(lit(1)).as("n"))
    orphans.crossJoin(total).select(
      lit(s"fk($factKey->$dimKey)").as("check"),
      ratio(col("n") - col("n_orphan"), col("n")).as("metric"),
      coalesce(col("n_orphan") === lit(0L), lit(false)).as("passed"))
  }

  /** X131: population-stability-index drift between two snapshots of a
    * numeric column — THE monitoring metric a production pipeline
    * thresholds on ("PSI > 0.25 → investigate the feed"): per fixed bin,
    * term = (p_b − p_a)·ln(p_b/p_a), PSI = Σ terms. Fixed-width bins
    * (not baseline quantiles) keep the binning deterministic and
    * cross-engine exact; the two snapshots bin in ONE pass (conditional
    * counts over the union — no second scan, no join), totals ride a
    * broadcast crossJoin of the one-row sums rather than a
    * single-partition window. Bins empty on EITHER side are excluded
    * from terms (the standard practice absent an epsilon) but still
    * reported with their counts so the exclusion is visible. Term and
    * fraction doubles follow the x60 ln discipline (identical
    * association + round 6). */
  def psiDrift(df: DataFrame, valueCol: Column, sideACol: Column,
               binWidth: Double, maxBin: Int): DataFrame = {
    // fixed-bins contract: values clamp into [0, maxBin] (negative values
    // land in bin 0, not an unbounded negative bin) and nulls are excluded
    // — missingness belongs to a completeness check, not a drift bin
    val binned = df
      .select(valueCol.as("__v"), sideACol.as("__a"))
      .filter(col("__v").isNotNull)
      .groupBy(greatest(least(floor(col("__v") / lit(binWidth)),
          lit(maxBin)), lit(0))
        .cast("int").as("bin"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val totals = binned.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    val pa = col("n_a").cast("double") / col("__ta").cast("double")
    val pb = col("n_b").cast("double") / col("__tb").cast("double")
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round((pb - pa) * log(pb / pa), 6)).as("psi_term"))
  }
}
