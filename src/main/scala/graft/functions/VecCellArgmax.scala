package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index of the cosine-nearest centroid in one
  * fused loop — `vec_cell_argmax(vec, centroids)` returns the 0-based
  * position j maximizing cos(vec, centroids[j]), ties to the LOWEST j
  * (strictly-greater replacement), null when no centroid admits a defined
  * cosine (zero-norm/mismatched-length/null-element centroids are
  * skipped; zero-norm or null-element vec is null).
  *
  * Why not `transform(centroids, c -> vec_cosine(vec, c))` + array_max +
  * array_position (the previous assignCells formulation): higher-order
  * lambdas evaluate INTERPRETED per element, so a codegen inner
  * expression buys nothing inside one — at k=300 cells × d=64 that was
  * ~19k boxed interpreted steps per row (the k-growing term of the
  * SemDeDup scale probe). This emits the whole k×d argmax as one
  * primitive nested loop in whole-stage codegen.
  *
  * Per-centroid arithmetic is bit-identical to [[VecCosine]] (dot and
  * norms accumulated in index order, dot / sqrt(xx·yy)), so plans that
  * mix vec_cosine scoring with argmax assignment stay consistent for
  * every defined cosine. One deliberate divergence from the HOF
  * `array_max` formulation this replaces: a NaN cosine (possible only
  * when xx·yy or dot underflows to 0 for denormal-range components) is
  * never selected — `c > best` rejects NaN — whereas array_max sorts
  * NaN above all values and would pick that centroid. An undefined
  * similarity is not a nearest centroid; skipping it is the intended
  * semantics, matching how null cosines are skipped.
  */
case class VecCellArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    val okMat = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (okVec && okMat) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cell_argmax requires (array<double>, array<array<double>>), " +
        s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = x.getDouble(i); xx += xv * xv; i += 1
    }
    if (xx == 0.0) return null
    var best = 0.0; var bestIdx = -1
    var j = 0
    val k = m.numElements()
    while (j < k) {
      if (!m.isNullAt(j)) {
        val y = m.getArray(j)
        if (y.numElements() == n) {
          var dot = 0.0; var yy = 0.0; var bad = false
          var t = 0
          while (t < n && !bad) {
            if (y.isNullAt(t)) bad = true
            else {
              val xv = x.getDouble(t); val yv = y.getDouble(t)
              dot += xv * yv; yy += yv * yv
            }
            t += 1
          }
          if (!bad && yy != 0.0) {
            val c = dot / math.sqrt(xx * yy)
            if (bestIdx < 0 || c > best) { best = c; bestIdx = j }
          }
        }
      }
      j += 1
    }
    if (bestIdx < 0) null else bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ad = classOf[ArrayData].getName
      val xa = ctx.freshName("xa"); val mm = ctx.freshName("mm")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val xx = ctx.freshName("xx"); val xv = ctx.freshName("xv")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bestIdx = ctx.freshName("bestIdx")
      val ya = ctx.freshName("ya"); val dot = ctx.freshName("dot")
      val yy = ctx.freshName("yy"); val bad = ctx.freshName("bad")
      val yv = ctx.freshName("yv"); val c = ctx.freshName("c")
      s"""
         |$ad $xa = ($ad) $a;
         |$ad $mm = ($ad) $b;
         |int $n = $xa.numElements();
         |double $xx = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($xa.isNullAt($i)) { ${ev.isNull} = true; }
         |  else { double $xv = $xa.getDouble($i); $xx += $xv * $xv; }
         |}
         |if (!${ev.isNull} && $xx == 0.0) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  double $best = 0.0; int $bestIdx = -1;
         |  int $k = $mm.numElements();
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($mm.isNullAt($j)) continue;
         |    $ad $ya = $mm.getArray($j);
         |    if ($ya.numElements() != $n) continue;
         |    double $dot = 0.0; double $yy = 0.0; boolean $bad = false;
         |    for (int $t = 0; $t < $n && !$bad; $t++) {
         |      if ($ya.isNullAt($t)) { $bad = true; }
         |      else {
         |        double $yv = $ya.getDouble($t);
         |        $dot += $xa.getDouble($t) * $yv; $yy += $yv * $yv;
         |      }
         |    }
         |    if ($bad || $yy == 0.0) continue;
         |    double $c = $dot / java.lang.Math.sqrt($xx * $yy);
         |    if ($bestIdx < 0 || $c > $best) { $best = $c; $bestIdx = $j; }
         |  }
         |  if ($bestIdx < 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $bestIdx; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCellArgmax =
    copy(left = newLeft, right = newRight)
}

object VecCellArgmax {
  /** Registers `vec_cell_argmax` (idempotent — see VecCosine.register). */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_cell_argmax", exprs => VecCellArgmax(exprs(0), exprs(1)),
        "built-in")

  /** Column-API entry point (session must have register()-ed). */
  def vec_cell_argmax(vec: Column, centroids: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "vec_cell_argmax", vec, centroids)
}
