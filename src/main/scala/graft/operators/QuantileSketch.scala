package graft.operators

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.{ExprUtils, TransformConfig}

/**
 * Serialization shell for a KLL sketch aggregation buffer: DataSketches
 * objects serialize via their own compact byte format, not Java/Kryo
 * field reflection. ObjectHashAggregate keeps the buffer ON-HEAP between
 * updates — this (de)serialization runs only at shuffle boundaries, i.e.
 * once per (group, partition) partial, never per row.
 */
final class KllHolder(@transient var sketch: KllDoublesSketch) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    val b = sketch.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    sketch = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** Nullable scalar input for the build aggregator (None rows are skipped,
  * matching SQL aggregate null semantics). */
final case class KllIn(v: Option[Double])

/** Binary input for the merge aggregator (a stored sketch per row). */
final case class KllBytesIn(b: Array[Byte])

/** Builds a KLL doubles sketch over a numeric column. */
final class KllBuildAggregator(k: Int) extends Aggregator[KllIn, KllHolder, Array[Byte]] {
  override def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))
  override def reduce(h: KllHolder, a: KllIn): KllHolder = {
    a.v.foreach(h.sketch.update)
    h
  }
  override def merge(a: KllHolder, b: KllHolder): KllHolder = {
    a.sketch.merge(b.sketch); a
  }
  override def finish(h: KllHolder): Array[Byte] = h.sketch.toByteArray
  override def bufferEncoder: Encoder[KllHolder] = Encoders.javaSerialization[KllHolder]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merges stored KLL sketches (build outputs read back). */
final class KllMergeAggregator(k: Int) extends Aggregator[KllBytesIn, KllHolder, Array[Byte]] {
  override def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))
  override def reduce(h: KllHolder, a: KllBytesIn): KllHolder = {
    if (a.b != null) {
      val in = KllDoublesSketch.heapify(Memory.wrap(a.b))
      // KLL merge degrades to min(k): merging a k=800 store into a k=200
      // buffer would quietly re-sketch all history at 4x the rank error.
      // Same fail-don't-degrade invariant as the HLL path's
      // hll_union_agg(..., allowDifferentLgConfigK = false).
      if (in.getK != k) throw new IllegalArgumentException(
        s"quantile_sketch merge: stored sketch was built with sketchK=${in.getK} " +
          s"but this merge runs at sketchK=$k — merging would silently degrade " +
          "precision to the smaller k; pass the matching sketchK")
      h.sketch.merge(in)
    }
    h
  }
  override def merge(a: KllHolder, b: KllHolder): KllHolder = {
    a.sketch.merge(b.sketch); a
  }
  override def finish(h: KllHolder): Array[Byte] = h.sketch.toByteArray
  override def bufferEncoder: Encoder[KllHolder] = Encoders.javaSerialization[KllHolder]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/**
 * quantile_sketch — mergeable quantile sketches (DataSketches KLL),
 * completing the incremental-ingest sketch triad next to the HLL
 * [[SketchTransform]] (distinct counts) and [[FrequentItemsTransform]]
 * (heavy hitters): build a fixed-size sketch per (group, column) per
 * ingest, merge across ingests, read percentiles anytime — p50/p99
 * tracking over a 100 TB corpus without ever rescanning history.
 * Normalized rank error is ~1.65% at the default k=200 and shrinks as
 * k^-0.9; while a group's value count stays within the level-0 buffer
 * (~k), ranks are EXACT (the oracle regime, same pattern as q74/q87).
 *
 * Modes:
 *  - `build` (default): aggregate data columns → one `<col>_kll` BINARY
 *    sketch per `groupBy` value.
 *  - `merge`: aggregate EXISTING `<col>_kll` columns — same shape.
 *  - `estimate`: per-row projection turning each sketch into one
 *    `<col>_p<NN>` DOUBLE per requested quantile (inclusive-rank rule:
 *    smallest value whose rank ≥ p — DuckDB's quantile_disc). Empty
 *    sketches estimate to NULL.
 *
 * The estimate step is a Scala UDF by design: it runs on sketch frames
 * (one row per group), never on the corpus — codegen is irrelevant there.
 *
 * {{{
 * - name: latency-percentiles
 *   type: quantile_sketch
 *   options: {columns: n_chars, groupBy: lang, quantiles: "0.5,0.99"}
 * }}}
 *
 * Options: `columns` required; `quantiles` (estimate; default
 * "0.25,0.5,0.75", fractions in (0,1]); `sketchK` (200, exactness/error
 * knob); `groupBy` optional.
 */
object QuantileSketchTransform extends Transform {
  val transformType = "quantile_sketch"

  private def pLabel(p: Double): String = {
    // 0.5 → p50, 0.99 → p99, 0.999 → p99_9 — via BigDecimal so binary
    // float error never leaks into the name (0.29 * 100 is
    // 28.999999999999996 in doubles, which made the column
    // `_p28_999999999999996` instead of `_p29`)
    val s = new java.math.BigDecimal(p.toString).movePointRight(2)
      .stripTrailingZeros.toPlainString.replace(".", "_")
    s"p$s"
  }

  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "columns")
    val cols = ExprUtils.parseColumns(config.options("columns"))
    if (cols.isEmpty) throw new ConfigException(
      "quantile_sketch: columns lists no column names")
    val groups = config.options.get("groupBy").map(ExprUtils.parseColumns).getOrElse(Nil)
    val k = config.options.get("sketchK").map(_.toInt).getOrElse(200)
    def grouped(df: DataFrame) =
      if (groups.isEmpty) df.groupBy() else df.groupBy(groups.map(col): _*)
    config.options.getOrElse("mode", "build") match {
      case "build" =>
        // the Option[Double] input encoder flattens to one nullable DOUBLE
        // column — pass the bare column, NULLs arrive as None and are skipped
        val build = udaf(new KllBuildAggregator(k), Encoders.product[KllIn])
        val aggs = cols.map(c =>
          build(col(c).cast("double")).as(s"${c}_kll"))
        grouped(input).agg(aggs.head, aggs.tail: _*)
      case "merge" =>
        val mergeA = udaf(new KllMergeAggregator(k), Encoders.product[KllBytesIn])
        val aggs = cols.map(c =>
          mergeA(col(s"${c}_kll")).as(s"${c}_kll"))
        grouped(input).agg(aggs.head, aggs.tail: _*)
      case "estimate" =>
        val ps = config.options.getOrElse("quantiles", "0.25,0.5,0.75")
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq
        ps.foreach { p =>
          if (p <= 0.0 || p > 1.0) throw new ConfigException(
            s"quantile_sketch: quantiles must be in (0,1], got $p")
        }
        val est = udf { (bytes: Array[Byte], p: Double) =>
          if (bytes == null) null
          else {
            val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
            if (sk.isEmpty) null else java.lang.Double.valueOf(sk.getQuantile(p))
          }
        }
        cols.foldLeft(input) { (df, c) =>
          ps.foldLeft(df) { (d, p) =>
            d.withColumn(s"${c}_${pLabel(p)}", est(col(s"${c}_kll"), lit(p)))
          }.drop(s"${c}_kll")
        }
      case other => throw new ConfigException(
        s"quantile_sketch mode must be build|merge|estimate, got '$other'")
    }
  }
}
