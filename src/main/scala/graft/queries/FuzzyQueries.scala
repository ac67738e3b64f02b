package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler

/** Entity-resolution / fuzzy-matching queries built on the native
  * jaro_winkler expression (graft.functions.JaroWinkler) — the string
  * half of record linkage, complementing the token-level near-dup family
  * (X30/X31). Oracle: DuckDB's jaro_winkler_similarity, whose semantics
  * the expression replicates exactly (boost threshold 0.7, prefix 4).
  */
object FuzzyQueries {

  val all: Seq[Query] = Seq(

    // Fuzzy name-pair candidates within a blocking key (p_brand): the
    // canonical entity-resolution shape — block to keep the self-join
    // quadratic only within small groups, score with a codegen'd
    // similarity, threshold, and emit candidate pairs. At 100 TB the
    // blocking key is what makes this feasible: the join is an equi-join
    // on the block, so Spark shuffles each block to one place instead of
    // a full cross product; the 10-char × 10-char JW scorer runs inside
    // whole-stage codegen on each blocked pair.
    // Threshold compares the ROUNDED score on both engines so a last-ulp
    // association difference cannot flip a boundary row in or out.
    Query("x67_jw_pairs",
      Some("""SELECT a.p_partkey AS p1, b.p_partkey AS p2,
             |  a.p_name AS name1, b.p_name AS name2,
             |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.84
             |  AND a.p_name <> b.p_name
             |ORDER BY p1, p2""".stripMargin),
      env => {
        JaroWinkler.register(env.spark)
        val p = env.part.select(col("p_partkey"), col("p_brand"), col("p_name"))
        val a = p.toDF("p1", "p_brand", "name1")
        val b = p.toDF("p2", "p_brand", "name2")
        a.join(b, "p_brand")
          .filter(col("p1") < col("p2") && col("name1") =!= col("name2"))
          .withColumn("jw",
            round(JaroWinkler.jaro_winkler(col("name1"), col("name2")), 6))
          .filter(col("jw") >= 0.84)
          .select("p1", "p2", "name1", "name2", "jw")
          .orderBy("p1", "p2")
      }),

    // Same scorer through the SQL surface (registry bridge): best fuzzy
    // match per misspelled probe against the nation dim — an asymmetric
    // small-probe lookup (broadcast the probes, scan the dim once).
    Query("x67_jw_best_match",
      Some("""WITH probes(probe) AS (VALUES ('BRAZZIL'), ('CHINNA'), ('FRANC'),
             |  ('UNTED STATES'), ('GERMANNY')),
             |scored AS (
             |  SELECT probe, n_name,
             |    round(jaro_winkler_similarity(probe, n_name), 6) AS jw,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY round(jaro_winkler_similarity(probe, n_name), 6) DESC,
             |               n_name) AS rn
             |  FROM probes CROSS JOIN nation)
             |SELECT probe, n_name AS best, jw FROM scored WHERE rn = 1
             |ORDER BY probe""".stripMargin),
      env => {
        import env.spark.implicits._
        JaroWinkler.register(env.spark)
        import org.apache.spark.sql.expressions.Window
        val probes = Seq("BRAZZIL", "CHINNA", "FRANC", "UNTED STATES", "GERMANNY")
          .toDF("probe")
        broadcast(probes).crossJoin(env.nation.select("n_name"))
          .withColumn("jw",
            round(JaroWinkler.jaro_winkler(col("probe"), col("n_name")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy("probe").orderBy(desc("jw"), col("n_name"))))
          .filter(col("rn") === 1)
          .select(col("probe"), col("n_name").as("best"), col("jw"))
          .orderBy("probe")
      })
  )
}
