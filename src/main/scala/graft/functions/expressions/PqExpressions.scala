package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: one vector's SPHERICAL product-quantization
 * code word — per subspace, the index of the L2-nearest centroid of the
 * L2-NORMALIZED vector (lower index on exact ties) — as one plan node
 * inside whole-stage codegen.
 *
 * The [[ArgTopCentroids]] treatment for [[graft.ann.Ann.pqTopK]]'s encode
 * loop: the codebooks ride as a reference object (never plan literals),
 * and this node replaces the engine's last hot `mapPartitions` — the old
 * form paid an `Encoders.row` serialize/deserialize round-trip per corpus
 * row outside codegen. Arithmetic is identical to the mapPartitions form
 * (normalize once, then per-subspace left-to-right squared-distance
 * accumulation with lower-index tie-break).
 *
 * Contracts shared with the frame-level guards around it:
 *  - a null element or non-finite component → null code word (the
 *    `finiteVec` filter upstream already drops such rows; the expression
 *    stays safe if composed without it),
 *  - a DIMENSION MISMATCH throws the store-drift error, never returns a
 *    wrong-subspace encoding: the embedding space changed since the PQ
 *    store was trained, and a silently dropped row would emit an empty
 *    result with no cause (pqTopK's dimCheck contract),
 *  - an all-zero vector has no direction to normalize and encodes raw —
 *    [[graft.ann.Ann]]'s unitVec zero contract.
 */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks, isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.expressions.PqEncode.compute(
         |  $c, $ref, $isDouble);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks))

  /** Static for codegen. Null element / NaN / Inf → null; dim mismatch →
    * the loud store-drift error. */
  def compute(vec: ArrayData, cbs: Array[Array[Array[Float]]],
              isDouble: Boolean): ArrayData = {
    val m = cbs.length
    val sd = cbs(0)(0).length
    val dim = m * sd
    val n = vec.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"pq_encode: vector has dim $n but the codebooks quantize dim $dim " +
        "(m·subDim) — the embedding space changed since the PQ store was " +
        "trained; retrain the store (or filter mixed-dim rows first if " +
        "they are expected)")
    // one finite-scan + norm pass (normalize ONCE, spherical contract)
    var norm = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      if (x.isNaN || x.isInfinite) return null
      norm += x * x
      i += 1
    }
    val inv = if (norm == 0.0) 1.0 else 1.0 / math.sqrt(norm)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0
        var t = 0
        while (t < sd) {
          val x = (if (isDouble) vec.getDouble(j * sd + t)
                   else vec.getFloat(j * sd + t).toDouble) * inv
          val diff = x - cv(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}

/**
 * Native Catalyst expression: one vector's IVFADC encoding — coarse IVF
 * list assignment plus the RESIDUAL's product-quantization code word, as
 * one fused plan node (struct(list_id, codes)). The Jégou et al. (TPAMI
 * 2011) billion-scale composition: quantize `unit(v) − centroid(list)`
 * instead of the vector itself, so the PQ codebooks spend their cells on
 * the (much tighter) residual distribution and the ADC scan can prune to
 * probed lists.
 *
 * Assignment is DELEGATED to [[ArgTopCentroids.compute]] (k=1) — the
 * exact arithmetic and (sim DESC, id ASC) tie-break the query-side probe
 * and the driver-side residual trainer use, so an identical vector lands
 * in an identical list at all three sites (the planted-twin guarantee
 * depends on it). Cosine assignment is scale-invariant, so the raw
 * vector assigns exactly as its unit form.
 *
 * Residuals are taken from the UNIT vector (the spherical contract —
 * a positive scale of a query yields the same residual) and quantized
 * RAW: normalizing the residual would destroy the ‖q−x‖ geometry ADC
 * reconstructs. Null element / non-finite component / all-NaN
 * assignment → null; a dimension mismatch against either codebook
 * throws the store-drift error.
 */
case class IvfPqEncode(child: Expression,
                       centroids: Array[Array[Float]],
                       codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "ivfpq_encode"

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivfpq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    IvfPqEncode.compute(input.asInstanceOf[ArrayData], centroids, codebooks,
      isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    val qRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.expressions.IvfPqEncode.compute(
         |  $c, $cRef, $qRef, $isDouble);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfPqEncode {
  def apply(vec: Column, centroids: Array[Array[Float]],
            codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(IvfPqEncode(GraftBridge.expression(vec), centroids,
      codebooks))

  /** The residual of a vector against an assigned-centroid set:
    * `unit(v) − centroids(assign(v))`, with the assignment made by
    * [[ArgTopCentroids.compute]] (k=1). Shared by the distributed encode
    * and the driver-side residual-codebook trainer so both quantize the
    * SAME residual distribution. Returns null on a null/non-finite
    * element or an all-NaN assignment. */
  def residual(vec: ArrayData, centroids: Array[Array[Float]],
               isDouble: Boolean): (Int, Array[Float]) = {
    val assigned = ArgTopCentroids.compute(vec, centroids, 1, isDouble,
      checkNulls = true)
    if (assigned == null || assigned.numElements() == 0) return null
    val li = assigned.getInt(0)
    val n = vec.numElements()
    var norm = 0.0
    var i = 0
    while (i < n) {
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      if (x.isNaN || x.isInfinite) return null
      norm += x * x
      i += 1
    }
    val inv = if (norm == 0.0) 1.0 else 1.0 / math.sqrt(norm)
    val cv = centroids(li)
    val r = new Array[Float](n)
    i = 0
    while (i < n) {
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      r(i) = (x * inv - cv(i)).toFloat
      i += 1
    }
    (li, r)
  }

  /** Static for codegen: assign, residual, RAW per-subspace L2 encode. */
  def compute(vec: ArrayData, centroids: Array[Array[Float]],
              cbs: Array[Array[Array[Float]]],
              isDouble: Boolean): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val m = cbs.length
    val sd = cbs(0)(0).length
    val dim = m * sd
    val n = vec.numElements()
    if (n != dim || centroids(0).length != dim)
      throw new IllegalArgumentException(
        s"ivfpq_encode: vector dim $n / centroid dim ${centroids(0).length} " +
          s"disagree with the residual codebooks' dim $dim (m·subDim) — " +
          "the embedding space changed since the IVFPQ store was trained; " +
          "retrain the store (or filter mixed-dim rows first if they are " +
          "expected)")
    val rl = residual(vec, centroids, isDouble)
    if (rl == null) return null
    val (li, r) = rl
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0
        var t = 0
        while (t < sd) {
          val diff = r(j * sd + t).toDouble - cv(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](li, new GenericArrayData(codes)))
  }
}

/**
 * Native Catalyst expression: ONE probe's negated ADC distance —
 * `−Σ_j luts(pi)(j)(codes(j))` for the (query, probed list) pair the
 * row's `pi` column names. The IVFADC counterpart of [[PqAdcNeg]]: where
 * flat PQ scores every query against every code word, IVFADC joins the
 * codes frame to the broadcast (list_id → probe) pairs FIRST, so each
 * row pays exactly one m-lookup sum per query that actually probes its
 * list — the pruned-scan shape that makes nProbe/nLists the scan
 * fraction. Width/value drift against the tables throws with guidance
 * (a codes frame encoded under a different store).
 */
case class PqAdcAt(left: Expression, right: Expression,
                   luts: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_at"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_at expects (array<int> codes, int probe index), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(codes: Any, pi: Any): Any =
    PqAdcAt.compute(codes.asInstanceOf[ArrayData],
      pi.asInstanceOf[Int], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, p) =>
      s"""
         |Object ${ev.value}_r = graft.functions.expressions.PqAdcAt.compute(
         |  $c, $p, $ref);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) ${ev.value}_r).doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcAt {
  def apply(codes: Column, pi: Column,
            luts: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqAdcAt(GraftBridge.expression(codes),
      GraftBridge.expression(pi), luts))

  /** Static for codegen. Null code slot → null; probe/width/value drift
    * → loud. */
  def compute(codes: ArrayData, pi: Int,
              luts: Array[Array[Array[Double]]]): java.lang.Double = {
    if (pi < 0 || pi >= luts.length) throw new IllegalArgumentException(
      s"pq_adc_at: probe index $pi is outside the ${luts.length} shipped " +
        "tables — the probe-pair frame and the tables were built from " +
        "different query sets")
    val lut = luts(pi)
    val m = lut.length
    if (codes.numElements() != m) throw new IllegalArgumentException(
      s"pq_adc_at: code word has ${codes.numElements()} codes but the " +
        s"query tables expect m=$m — the codes frame was encoded under a " +
        "different store; re-encode it (or load the store it was encoded " +
        "with)")
    var adc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      val tbl = lut(j)
      if (c < 0 || c >= tbl.length) throw new IllegalArgumentException(
        s"pq_adc_at: code $c at subspace $j is outside the store's " +
          s"${tbl.length} centroids — the codes frame was encoded under a " +
          "different store; re-encode it (or load the store it was " +
          "encoded with)")
      adc += tbl(c)
      j += 1
    }
    java.lang.Double.valueOf(-adc)
  }
}

/**
 * Native Catalyst expression: a code word's NEGATED asymmetric (ADC)
 * distances to every query — `out(qi) = −Σ_j lut(qi)(j)(codes(j))` — as
 * one plan node ([[graft.ann.Ann.pqTopK]] step 2+3 without the
 * `mapPartitions` + `Encoders.row` round-trip the old form paid per row).
 * Negated so `posexplode` + the shared (sim DESC, id ASC) bounded-heap
 * top-k rank lowest distance first unchanged.
 *
 * The per-query m×k lookup tables ride as ONE reference object, built
 * once at the driver from the ALREADY-COLLECTED (small by the ANN
 * contract) normalized query vectors — |queries|·m·k doubles, the same
 * ship-once class as the codebooks themselves. Per (row, query) cost is
 * m array reads; the dim-length loop never runs here.
 *
 * A code word whose width or code values disagree with the tables is
 * STORE DRIFT (a codes frame persisted under a different PQ store) and
 * throws with guidance — an out-of-range read would be a silent wrong
 * answer or an opaque task abort.
 */
case class PqAdcNeg(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_neg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_neg expects array<int> code words, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqAdcNeg.compute(input.asInstanceOf[ArrayData], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.expressions.PqAdcNeg.compute($c, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcNeg {
  def apply(codes: Column, luts: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqAdcNeg(GraftBridge.expression(codes), luts))

  /** Static for codegen. Null code slot → null (a row the encode stage
    * nulled); width/value drift → loud. */
  def compute(codes: ArrayData, luts: Array[Array[Array[Double]]]): ArrayData = {
    val nq = luts.length
    val out = new Array[Double](nq)
    if (nq == 0) return new GenericArrayData(out)
    val m = luts(0).length
    if (codes.numElements() != m) throw new IllegalArgumentException(
      s"pq_adc_neg: code word has ${codes.numElements()} codes but the " +
        s"query tables expect m=$m — the codes frame was encoded under a " +
        "different PQ store; re-encode it (or load the store it was " +
        "encoded with)")
    var qi = 0
    while (qi < nq) {
      val lut = luts(qi)
      var adc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = codes.getInt(j)
        val tbl = lut(j)
        if (c < 0 || c >= tbl.length) throw new IllegalArgumentException(
          s"pq_adc_neg: code $c at subspace $j is outside the store's " +
            s"${tbl.length} centroids — the codes frame was encoded under " +
            "a different PQ store; re-encode it (or load the store it was " +
            "encoded with)")
        adc += tbl(c)
        j += 1
      }
      out(qi) = -adc
      qi += 1
    }
    new GenericArrayData(out)
  }
}
