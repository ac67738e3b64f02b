package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings —
  * the fuzzy-match primitive for entity resolution / name dedup that
  * Spark's built-in function set lacks (it stops at levenshtein).
  *
  * Semantics pinned against DuckDB's jaro_winkler_similarity on the
  * high-similarity band (fixture matrix in JaroWinklerSpec):
  *  - either side empty => 0.0 (DuckDB returns 0 even for '' vs '');
  *  - match window floor(max(|s|,|t|)/2)-1 (>= 0), standard greedy Jaro
  *    matches/transpositions;
  *  - Winkler prefix boost (scale 0.1, prefix capped at 4) applied only
  *    when jaro > 0.7 (the classic boost threshold — DuckDB keeps it);
  *  - comparison is per Java char (= per codepoint for ASCII corpora;
  *    the testdata is ASCII).
  *
  * PARITY LIMIT: DuckDB 1.x vendors rapidfuzz, whose match/transposition
  * assignment is NOT the textbook greedy one — on repeated-character,
  * transposition-heavy pairs it finds fewer transpositions (e.g.
  * ('BAA BA','AAA A B ABB ') scores 0.65 here vs 0.68333 in DuckDB).
  * Fuzzing showed every observed divergence sits BELOW 0.80 (scores
  * >= 0.80 agreed exactly on all TPC-H scale factors), so oracle-checked
  * queries must threshold at >= 0.8 — FuzzyQueries uses 0.84. Don't
  * lower the threshold or emit raw sub-0.8 scores into an oracle compare
  * without re-fuzzing.
  *
  * Like Spark's own Levenshtein, codegen stays inside whole-stage codegen
  * by calling a static scorer (the O(|s|·|t|) loop needs scratch arrays,
  * which inline codegen can't allocate cleanly) — no interpreted
  * fallback, no boxing on the hot path.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case StringType => true
      case org.apache.spark.sql.types.NullType => true // NULL literal
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static scorer shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars in order on both sides
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - trans / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro // boost threshold — below it, plain Jaro
    var p = 0
    val maxP = math.min(4, math.min(n, m))
    while (p < maxP && s.charAt(p) == t.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** Registers `jaro_winkler` in the session's function registry
    * (idempotent; required before Column/SQL use). */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")

  /** Column-API entry point (session must have register()-ed). */
  def jaro_winkler(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
}
