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
 * Semantics: dot over the common prefix, norms over each full array,
 * left-to-right double accumulation, 0.0 when either norm is zero, null
 * when either side is null. KNOWN DIVERGENCE from the zip_with HOF
 * composition: zip_with pads the shorter array with nulls, so the HOF
 * returns NULL on length-mismatched arrays (and on null elements),
 * while this expression returns the common-prefix value and treats
 * element slots positionally (null elements read as 0/garbage). All
 * graft callers pass fixed-dimension, non-null embedding vectors where
 * the two agree.
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
      // every local comes from ctx.freshName — fixed names collide with
      // locals the enclosing whole-stage-codegen function already
      // declares (Janino rejects the shadowing and the whole plan falls
      // back to interpreted execution)
      val i = ctx.freshName("i")
      val nA = ctx.freshName("csNA")
      val nB = ctx.freshName("csNB")
      val n = ctx.freshName("csN")
      val dot = ctx.freshName("csDot")
      val na = ctx.freshName("csNa")
      val nb = ctx.freshName("csNb")
      val x = ctx.freshName("csX")
      val y = ctx.freshName("csY")
      // products in the elements' own type before widening (parity with
      // the built-in zip_with/transform arithmetic)
      val dotExpr =
        if (!leftIsDouble && !rightIsDouble)
          s"(double) ($a.getFloat($i) * $b.getFloat($i))"
        else {
          def g(arr: String, isDouble: Boolean) =
            if (isDouble) s"$arr.getDouble($i)"
            else s"(double) $arr.getFloat($i)"
          s"${g(a, leftIsDouble)} * ${g(b, rightIsDouble)}"
        }
      val sqA = if (leftIsDouble)
        s"double $x = $a.getDouble($i); $na += $x * $x;"
      else s"$na += (double) ($a.getFloat($i) * $a.getFloat($i));"
      val sqB = if (rightIsDouble)
        s"double $y = $b.getDouble($i); $nb += $y * $y;"
      else s"$nb += (double) ($b.getFloat($i) * $b.getFloat($i));"
      s"""
         |int $nA = $a.numElements();
         |int $nB = $b.numElements();
         |int $n = Math.min($nA, $nB);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $dotExpr;
         |}
         |for (int $i = 0; $i < $nA; $i++) { $sqA }
         |for (int $i = 0; $i < $nB; $i++) { $sqB }
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

