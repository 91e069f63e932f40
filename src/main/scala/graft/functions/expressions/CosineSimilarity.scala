package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: cosine similarity between two numeric array
 * columns, with `doGenCode` emitting a single fused loop (dot + both norms
 * in one pass over primitive ArrayData accessors).
 *
 * Why a custom Expression (SURVEY §7.3's one sanctioned case): the
 * composable form — aggregate(zip_with(a,b,*)) / norms — is a higher-order
 * function tree, which Spark evaluates INTERPRETED per element, and it
 * walks each array three times. On ANN candidate verification that fold is
 * the hot path (millions of pairs × vector width). This expression stays
 * inside whole-stage codegen and matches the composable form's arithmetic
 * exactly (same left-to-right accumulation, same dot/(√na·√nb) shape), so
 * results are bit-identical and oracle checks are unaffected.
 *
 * Dirty data degrades to null, exactly like the HOF form: a length
 * mismatch, or a null element in either array, yields null (zip_with pads
 * the shorter side with nulls, which nulls the whole fold) — never a
 * silent prefix similarity or a 0.0-for-null read. The per-element null
 * branch is emitted only when the array schema says containsNull=true.
 */
case class CosineSimilarity(left: Expression, right: Expression)
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
        s"cosine_similarity expects numeric array inputs, got " +
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
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, lt, i); val y = get(b, rt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
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
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val denom = ctx.freshName("denom")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val nullElemGuard =
        if (checkElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemGuard
         |    final double $x = ${accessor(a, lt, i)};
         |    final double $y = ${accessor(b, rt, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
