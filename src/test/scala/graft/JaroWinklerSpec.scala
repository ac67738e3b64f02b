package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** Fixture matrix for the native jaro_winkler expression — the classic
  * published values plus DuckDB-parity cases (expected values below were
  * read from DuckDB 1.x `jaro_winkler_similarity` directly), boundary
  * cases for the 0.7 boost threshold and the prefix-4 cap, and the one
  * documented DIVERGENCE class (repeated-char transposition-heavy pairs,
  * where DuckDB's vendored rapidfuzz finds fewer transpositions than the
  * textbook greedy assignment — all observed divergences score < 0.80).
  */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def score(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  // (s, t, expected) — expected values match DuckDB jaro_winkler_similarity
  private val duckdbParity = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),       // classic: 1 transposition
    ("DWAYNE", "DUANE", 0.8400000000000001),        // classic
    ("DIXON", "DICKSONX", 0.8133333333333332),      // classic
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("", "", 0.0),                                  // DuckDB: empty => 0, not 1
    ("", "ABC", 0.0),
    ("ABC", "", 0.0),
    ("ABC", "ABC", 1.0),
    ("A", "A", 1.0),
    ("A", "B", 0.0),
    ("AB", "BA", 0.0),                              // window 0: no matches
    ("AACC", "CCAA", 0.5),                          // 2 matches, 2 transpositions
    ("CRAZY", "ZYCRA", 0.0),
    ("ABCDEFGH", "ABCDXXXX", 0.6666666666666666),   // jaro <= 0.7: NO boost
    ("ABCDEEFGH", "ABCDEXXXX", 0.8222222222222222), // prefix 5 capped at 4
    ("BRAZZIL", "BRAZIL", 0.9714285714285714),
    ("UNTED STATES", "UNITED STATES", 0.9794871794871796))

  test("scorer matches DuckDB jaro_winkler_similarity on the fixture matrix") {
    for ((a, b, want) <- duckdbParity)
      assert(math.abs(score(a, b) - want) < 1e-12,
        s"('$a','$b'): got ${score(a, b)}, DuckDB $want")
  }

  test("symmetry and self-similarity") {
    for ((a, b, _) <- duckdbParity)
      assert(score(a, b) === score(b, a), s"asymmetric on ('$a','$b')")
    assert(score("SOME STRING", "SOME STRING") === 1.0)
  }

  test("boost threshold boundary: no Winkler boost at jaro <= 0.7") {
    // ABCDEFGH/ABCDXXXX has jaro exactly 2/3 with a 4-char common prefix;
    // a mis-applied boost would lift it to 0.8 — DuckDB leaves it at 2/3
    assert(score("ABCDEFGH", "ABCDXXXX") === 2.0 / 3.0)
    // ABCDEEFGH/ABCDEXXXX sits just above: jaro 0.7037 -> boosted
    val jaro = (5.0 / 9 + 5.0 / 9 + 1.0) / 3
    assert(math.abs(score("ABCDEEFGH", "ABCDEXXXX") -
      (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("prefix cap: boost uses min(4, common prefix)") {
    // same pair: common prefix is 5 (ABCDE) but only 4 counts — an uncapped
    // implementation would score 0.851852 instead of 0.822222
    assert(math.abs(score("ABCDEEFGH", "ABCDEXXXX") - 0.8222222222222222) < 1e-12)
  }

  test("documented divergence: rapidfuzz assignment differs below 0.80") {
    // textbook greedy finds 8 matches / 2.5 transpositions -> 0.65; DuckDB's
    // rapidfuzz assignment yields 0.68333. This class of pair is WHY the
    // oracle contract requires thresholds >= 0.8 (FuzzyQueries uses 0.84).
    val got = score("BAA BA", "AAA A B ABB ")
    assert(math.abs(got - 0.65) < 1e-12, s"greedy scorer moved: $got")
    assert(got < 0.8, "divergence case must stay below the oracle threshold")
  }

  test("expression surfaces: Column API and SQL agree with the scorer (codegen path)") {
    JaroWinkler.register(spark)
    val df = duckdbParity.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaCol = df.select(JaroWinkler.jaro_winkler(col("a"), col("b")))
      .as[Double].collect()
    df.createOrReplaceTempView("jw_fixtures")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_fixtures")
      .as[Double].collect()
    val want = duckdbParity.map(_._3)
    for (((c, s), w) <- viaCol.zip(viaSql).zip(want)) {
      assert(math.abs(c - w) < 1e-12)
      assert(c === s)
    }
  }

  test("null propagation: NULL input yields NULL (matching DuckDB)") {
    JaroWinkler.register(spark)
    val rows = spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'ABC'), " +
        "jaro_winkler('ABC', CAST(NULL AS STRING))").collect()
    assert(rows.head.isNullAt(0) && rows.head.isNullAt(1))
  }
}
