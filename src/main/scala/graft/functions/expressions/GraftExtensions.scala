package graft.functions.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point exposing graft's native expressions to
 * SQL: `spark.sql("SELECT cosine_similarity(a, b) ...")`.
 *
 * Two registration paths:
 *  - config-time: `.withExtensions(new GraftExtensions)` or
 *    `spark.sql.extensions=graft.functions.expressions.GraftExtensions`
 *  - post-hoc on a live session: [[GraftExtensions.register]] (used by the
 *    verify/bench mains where the session already exists).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity expects exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product expects exactly 2 arguments")
        DotProduct(args.head, args(1))
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes expects (text, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes: n must be an integer literal, got $other")
        }
        ShingleHashes(args.head, n)
      }))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
