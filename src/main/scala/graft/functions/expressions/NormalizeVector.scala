package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the L2-normalized copy of a numeric array
 * (doubles; the zero vector passes through unscaled, so the result is
 * total). One fused pass — sum of squares, sqrt, divide — with the same
 * left-to-right accumulation as the composable
 * `sqrt(aggregate(zip_with(a,a,*), 0.0, +))` form it replaces, so results
 * are bit-identical and oracle checks are unaffected.
 *
 * Why a custom Expression (same case as [[CosineSimilarity]]): the HOF
 * form evaluates INTERPRETED, walks the array once per lambda, and the
 * `when(norm === 0)` guard makes Catalyst evaluate the norm fold twice
 * per row. Normalization sits in front of every ANN/near-dup flow —
 * at 100 TB that is per-row work on every vector in the corpus; profiled
 * at sf0.1 the interpreted chain made q60 the single slowest query in
 * the suite (1.64 s for 2 000 rows).
 *
 * Element nulls: parquet array columns default to nullable elements even
 * when no null is ever present, so the type check cannot reject
 * `containsNull = true` without breaking every real embedding column.
 * Instead a null ELEMENT makes the whole result null (the null-propagating
 * behavior of the HOF form this replaces) — never silently read as 0.0.
 */
case class NormalizeVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // result is null for a null input OR any null element
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize expects a numeric array input, got ${other.simpleString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any =
    NormalizeVector.compute(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    val res = ctx.freshName("normVecRes")
    // not defineCodeGen: compute() returns null on a null element, which
    // must flow to ev.isNull rather than a null-valued "non-null" slot
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res =
        graft.functions.expressions.NormalizeVector.compute($c, $t);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeVector {
  def apply(vec: Column): Column =
    GraftBridge.column(NormalizeVector(GraftBridge.expression(vec)))

  /** Static so generated code calls it directly. Returns null when any
    * element is null (null-propagating, matching the HOF form). */
  def compute(input: ArrayData, t: DataType): ArrayData = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) { if (input.isNullAt(j)) return null; j += 1 }
    t match {
      case FloatType   => var i = 0; while (i < n) { v(i) = input.getFloat(i).toDouble; i += 1 }
      case DoubleType  => var i = 0; while (i < n) { v(i) = input.getDouble(i); i += 1 }
      case IntegerType => var i = 0; while (i < n) { v(i) = input.getInt(i).toDouble; i += 1 }
      case LongType    => var i = 0; while (i < n) { v(i) = input.getLong(i).toDouble; i += 1 }
      case _           => throw new IllegalStateException("unreachable")
    }
    var ss = 0.0
    var i = 0
    while (i < n) { ss += v(i) * v(i); i += 1 }
    val norm = math.sqrt(ss)
    if (norm != 0.0) {
      i = 0
      while (i < n) { v(i) = v(i) / norm; i += 1 }
    }
    new GenericArrayData(v)
  }
}
