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
  /** Evaluate a foldable integral argument (literal or constant expression,
    * any integer width) to Int, with a typed analysis-style error instead of
    * a match crash on e.g. BIGINT literals or `1 + 1`. */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = {
    def fail(got: String) = throw new graft.api.ConfigException(
      s"$fn: $arg must be a constant integer, got $got")
    if (!e.foldable) fail(e.sql)
    e.eval() match {
      case i: Int    => i
      case l: Long   => if (l.isValidInt) l.toInt else fail(s"out-of-range $l")
      case s: Short  => s.toInt
      case b: Byte   => b.toInt
      case other     => fail(if (other == null) "NULL" else s"${e.dataType.simpleString} $other")
    }
  }

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
        ShingleHashes(args.head, foldableInt("shingle_hashes", "n", args(1)))
      }),
    ("vec_normalize",
      new ExpressionInfo(classOf[NormalizeVector].getName, "vec_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_normalize expects exactly 1 argument")
        NormalizeVector(args.head)
      }),
    ("hyperplane_buckets",
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hyperplane_buckets expects (vec, tables, bits)")
        HyperplaneBuckets(args.head,
          foldableInt("hyperplane_buckets", "tables", args(1)),
          foldableInt("hyperplane_buckets", "bits", args(2)))
      }),
    ("minhash_from_hashes",
      new ExpressionInfo(classOf[MinHashFromHashes].getName, "minhash_from_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_from_hashes expects (hashes, k)")
        MinHashFromHashes(args.head, foldableInt("minhash_from_hashes", "k", args(1)))
      }),
    ("simhash_from_hashes",
      new ExpressionInfo(classOf[SimHashFromHashes].getName, "simhash_from_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_from_hashes expects (hashes)")
        SimHashFromHashes(args.head)
      }),
    ("unicode_normalize",
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "unicode_normalize expects (text, form)")
        val form = args(1) match {
          case e if e.foldable => e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new graft.api.ConfigException(
              s"unicode_normalize: form must be a string literal, got $other")
          }
          case e => throw new graft.api.ConfigException(
            s"unicode_normalize: form must be a constant, got ${e.sql}")
        }
        UnicodeNormalize(args.head, form)
      }))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
