package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for cosine similarity of two numeric-array
 * columns — participates in WHOLE-STAGE CODEGEN via `doGenCode` (a tight
 * Java loop), unlike the `aggregate`/`zip_with` higher-order-function
 * composition (interpreted per element) or a Scala UDF (boxing +
 * conversion per row).
 *
 * Semantics match `Similarity.cosine`'s HOF formulation exactly: dot
 * over the common prefix, norms over each full array, left-to-right
 * double accumulation, 0.0 when either norm is zero, null when either
 * side is null.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @inline private def get(a: ArrayData, isDouble: Boolean, i: Int): Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble

  private lazy val leftIsDouble =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  private lazy val rightIsDouble =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val nA = a.numElements(); val nB = b.numElements()
    val n = math.min(nA, nB)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    // products happen in the elements' own type before widening — the
    // exact arithmetic the equivalent built-in zip_with/transform does
    while (i < n) {
      dot +=
        (if (!leftIsDouble && !rightIsDouble)
          (a.getFloat(i) * b.getFloat(i)).toDouble
        else get(a, leftIsDouble, i) * get(b, rightIsDouble, i))
      i += 1
    }
    i = 0
    while (i < nA) {
      na += (if (leftIsDouble) { val x = a.getDouble(i); x * x }
        else (a.getFloat(i) * a.getFloat(i)).toDouble)
      i += 1
    }
    i = 0
    while (i < nB) {
      nb += (if (rightIsDouble) { val y = b.getDouble(i); y * y }
        else (b.getFloat(i) * b.getFloat(i)).toDouble)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // products in the elements' own type before widening (parity with
      // the built-in zip_with/transform arithmetic)
      val dotExpr =
        if (!leftIsDouble && !rightIsDouble)
          s"(double) ($a.getFloat(i) * $b.getFloat(i))"
        else {
          def g(arr: String, isDouble: Boolean) =
            if (isDouble) s"$arr.getDouble(i)" else s"(double) $arr.getFloat(i)"
          s"${g(a, leftIsDouble)} * ${g(b, rightIsDouble)}"
        }
      val sqA = if (leftIsDouble)
        s"double x = $a.getDouble(i); csNa += x * x;"
      else s"csNa += (double) ($a.getFloat(i) * $a.getFloat(i));"
      val sqB = if (rightIsDouble)
        s"double y = $b.getDouble(i); csNb += y * y;"
      else s"csNb += (double) ($b.getFloat(i) * $b.getFloat(i));"
      s"""
         |int csNA = $a.numElements();
         |int csNB = $b.numElements();
         |int csN = Math.min(csNA, csNB);
         |double csDot = 0.0; double csNa = 0.0; double csNb = 0.0;
         |for (int i = 0; i < csN; i++) {
         |  csDot += $dotExpr;
         |}
         |for (int i = 0; i < csNA; i++) { $sqA }
         |for (int i = 0; i < csNB; i++) { $sqB }
         |${ev.value} = (csNa == 0.0 || csNb == 0.0) ? 0.0
         |  : csDot / (Math.sqrt(csNa) * Math.sqrt(csNb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

