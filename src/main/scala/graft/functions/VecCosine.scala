package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in a
  * single fused loop — dot, ‖a‖², ‖b‖² accumulated together, then
  * dot / sqrt(‖a‖²·‖b‖²) (the same association DuckDB's
  * list_cosine_similarity uses, so oracle rounding agrees).
  *
  * Why an Expression and not zip_with+aggregate (SURVEY §4.2 fallback
  * tier b): higher-order lambdas evaluate interpreted, per element, with
  * boxing — measured 52 s for the 2M-pair sf0.1 near-dup query. This
  * doGenCode emits a tight primitive loop inside whole-stage codegen
  * (~15× faster) and also backs the SQL function `vec_cosine`.
  *
  * Semantics (matching the zip_with formulation it replaced): inputs must
  * be array<double> (analysis error otherwise; NULL literals accepted);
  * mismatched lengths, null elements, and zero-norm vectors (undefined
  * cosine, would be 0/0) yield null — never NaN or a silently-truncated
  * score.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    if (xx == 0.0 || yy == 0.0) null
    else dot / math.sqrt(xx * yy)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // Operands are re-cast to ArrayData locally: when a child is a NULL
      // literal (NullType) its generated java type is Object, and calling
      // numElements() on it directly fails Janino compilation — which would
      // silently drop the whole stage to interpreted execution. The inner
      // block never runs for null inputs, so the cast is safe.
      val ad = classOf[ArrayData].getName
      s"""
         |$ad $xa = ($ad) $a;
         |$ad $ya = ($ad) $b;
         |int $n = $xa.numElements();
         |if ($n != $ya.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $xx = 0.0; double $yy = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $xv = $xa.getDouble($i);
         |      double $yv = $ya.getDouble($i);
         |      $dot += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($xx == 0.0 || $yy == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / java.lang.Math.sqrt($xx * $yy);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosine {
  /** Registers `vec_cosine` in the session's function registry (idempotent;
    * required before vec_cosine()/SQL use — the registry is the public
    * bridge from a catalyst Expression to the Column world). */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_cosine", exprs => VecCosine(exprs(0), exprs(1)), "built-in")

  /** Column-API entry point (session must have register()-ed). */
  def vec_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_cosine", a, b)
}
