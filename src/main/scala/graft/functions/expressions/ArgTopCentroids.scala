package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: ids of the `k` nearest centroids to a vector
 * by cosine similarity (ties broken toward the lower id), as one plan node.
 *
 * The codebook rides along as a reference object — NOT as plan literals.
 * The composed form it replaces built `nLists` separate
 * `CosineSimilarity(vec, typedLit(centroid))` expressions plus a
 * `greatest`/`sort_array` over `nLists` structs, duplicated on the corpus
 * AND query sides — at IVF defaults (64 lists × 64 dims) that is ~8k
 * literal doubles and hundreds of expression nodes per plan, the same
 * plan-size pathology class as the round-2 hyperplane regression. Here the
 * plan carries ONE node and the generated code one static call; the
 * codebook array is shipped once per task via the references array.
 *
 * Arithmetic is bit-identical to the composed form (spec-asserted): per
 * centroid the same fused dot/norms loop as [[CosineSimilarity]]
 * (left-to-right double accumulation, 0.0 on zero denominator), and the
 * same (sim DESC, id ASC) ordering as the greatest-struct / sorted-struct
 * selection it replaces.
 *
 * Dirty vectors degrade to null, matching [[CosineSimilarity]]: a null
 * element (parquet arrays default containsNull=true — a null slot must not
 * read as 0.0) or a dimensionality different from the codebook's yields a
 * null assignment, which downstream explode/joins drop. The null-element
 * scan is skipped when the schema says containsNull=false.
 */
case class ArgTopCentroids(child: Expression, centroids: Array[Array[Float]], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null on null elements / codebook-dim mismatch even for non-null input
  override def nullable: Boolean = true

  private def checkElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arg_top_centroids expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArgTopCentroids.compute(
      input.asInstanceOf[ArrayData], centroids, k, isDouble, checkElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.expressions.ArgTopCentroids.compute(
         |  $c, $ref, $k, $isDouble, $checkElems);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Cosine similarity to the NEAREST centroid (the "how central is this
 * document" signal): the sim [[ArgTopCentroids]] computes and discards,
 * as one plan node with the codebook riding as a reference object. The
 * composed form it replaces looked the assigned centroid up in an
 * `element_at(array(array(lit…)))` literal — nClusters×dim literals per
 * plan, the exact pathology class ArgTopCentroids exists to avoid.
 * Arithmetic and tie-break are identical to assigning with
 * ArgTopCentroids(k=1) and fusing CosineSimilarity against the winner
 * (same left-to-right loops, NaN-sims never win, all-NaN → null). Null
 * vector / null element / dim mismatch → null, the shared contract.
 */
case class NearestCentroidSim(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def checkElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_sim expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArgTopCentroids.nearestSim(
      input.asInstanceOf[ArrayData], centroids, isDouble, checkElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.expressions.ArgTopCentroids.nearestSim(
         |    $c, $ref, $isDouble, $checkElems);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidSim {
  def apply(vec: Column, centroids: Array[Array[Float]]): Column =
    GraftBridge.column(NearestCentroidSim(GraftBridge.expression(vec), centroids))
}

object ArgTopCentroids {
  def apply(vec: Column, centroids: Array[Array[Float]], k: Int): Column =
    GraftBridge.column(ArgTopCentroids(GraftBridge.expression(vec), centroids, k))

  /** Static for codegen: cosine against every centroid (same fused loop as
    * CosineSimilarity), then select the k best by (sim DESC, id ASC) with a
    * simple repeated-max scan — nLists is small by IVF's definition.
    * Returns null for a vector with a null element (scanned only if
    * `checkNulls`) or whose dim differs from the codebook's. */
  def compute(vec: ArrayData, centroids: Array[Array[Float]], k: Int,
              isDouble: Boolean, checkNulls: Boolean): ArrayData = {
    val nLists = centroids.length
    if (nLists > 0 && vec.numElements() != centroids(0).length) return null
    if (checkNulls) {
      var i = 0
      val d = vec.numElements()
      while (i < d) { if (vec.isNullAt(i)) return null; i += 1 }
    }
    val sims = new Array[Double](nLists)
    var c = 0
    while (c < nLists) {
      val cv = centroids(c)
      val n = math.min(vec.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        val y = cv(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      sims(c) = if (denom == 0.0) 0.0 else dot / denom
      c += 1
    }
    val kk = math.min(k, nLists)
    val out = new Array[Int](kk)
    val used = new Array[Boolean](nLists)
    var r = 0
    var done = false
    while (r < kk && !done) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < nLists) {
        // a NaN sim (Inf/NaN vector component) never wins — without the
        // guard best could stay -1 and used(-1) kills the executor task
        if (!used(j) && !sims(j).isNaN && sims(j) > bestSim) {
          best = j; bestSim = sims(j)
        }
        j += 1
      }
      if (best < 0) done = true // every remaining sim NaN: emit the prefix
      else {
        used(best) = true
        out(r) = best
        r += 1
      }
    }
    new GenericArrayData(if (r == kk) out else java.util.Arrays.copyOf(out, r))
  }

  /** Static for codegen: the best centroid's cosine under the same
    * (sim DESC, id ASC) selection as [[compute]] — identical guards
    * (null element / dim mismatch → null, NaN sims never win, all-NaN →
    * null, empty codebook → null). */
  def nearestSim(vec: ArrayData, centroids: Array[Array[Float]],
                 isDouble: Boolean, checkNulls: Boolean): java.lang.Double = {
    val nLists = centroids.length
    if (nLists == 0) return null
    if (vec.numElements() != centroids(0).length) return null
    if (checkNulls) {
      var i = 0
      val d = vec.numElements()
      while (i < d) { if (vec.isNullAt(i)) return null; i += 1 }
    }
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < nLists) {
      val cv = centroids(c)
      val n = math.min(vec.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        val y = cv(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      if (!sim.isNaN && sim > bestSim) { best = c; bestSim = sim }
      c += 1
    }
    if (best < 0) null else java.lang.Double.valueOf(bestSim)
  }
}
