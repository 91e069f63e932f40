package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: dot product of two numeric array columns with
 * a single fused codegen loop — the projection primitive behind
 * random-hyperplane LSH bucketing (`Ann.bucketTable`), where each row
 * computes tables×bits dot products against LITERAL hyperplane vectors.
 * Same rationale as [[CosineSimilarity]] (SURVEY §7.3): the composable
 * `aggregate(zip_with(...))` form evaluates interpreted per element.
 * Arithmetic is the same left-to-right accumulation as the HOF form, and
 * so is dirty-data handling: length mismatch or a null element → null
 * (zip_with pads with nulls), never a silent prefix product. The
 * per-element null branch is skipped when the schema has containsNull=false
 * (e.g. literal hyperplane arrays), keeping the LSH hot loop branch-free.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on mismatched lengths / null elements even when inputs are non-null
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects numeric array inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  @inline private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case _           => throw new IllegalStateException("unreachable")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val lt = elemType(left).get; val rt = elemType(right).get
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += get(a, lt, i) * get(b, rt, i); i += 1
    }
    dot
  }

  private def containsNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def accessor(arr: String, t: DataType, i: String): String = t match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case _           => throw new IllegalStateException("unreachable")
    }
    val lt = elemType(left).get; val rt = elemType(right).get
    val checkElems = containsNull(left) || containsNull(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nullElemGuard =
        if (checkElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  final int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemGuard
         |    $dot += ${accessor(a, lt, i)} * ${accessor(b, rt, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
