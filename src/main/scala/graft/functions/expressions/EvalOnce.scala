package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * Identity wrapper that declares itself NON-DETERMINISTIC so the
 * optimizer may not duplicate, re-order, or inline the wrapped
 * expression — the native-expression analogue of
 * `udf.asNondeterministic()` (optimization-guide §4.4).
 *
 * The one consumer class: a STAGED expensive column (a per-row token /
 * line / tokenizer-encode walk aliased in a Project) that a downstream
 * Filter references. `PushPredicateThroughNonJoin` substitutes aliases
 * into the pushed predicate with no cost check, so every reference in a
 * `when` chain re-evaluates the full walk per row (measured on the
 * quality_rules filter path: 14 TokenSignals evaluations in the pushed
 * plan, 3.3× the annotate cost for identical output). Wrapping the
 * staged alias blocks the substitution; the walk runs once per row in
 * its staging Project and the filter reads the staged attribute.
 *
 * The wrapped expression IS deterministic — results are identical; only
 * optimizer moves are forbidden. Cost: predicates from LATER operators
 * cannot be pushed through the staging Project either, so use this only
 * where the staging is immediately consumed (a same-operator gate),
 * never on columns a long downstream pipeline filters on.
 */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: hide determinism from the optimizer
  override lazy val deterministic: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvalOnce {
  def apply(c: Column): Column =
    GraftBridge.column(EvalOnce(GraftBridge.expression(c)))
}
