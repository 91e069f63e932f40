package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType, MapType, ShortType, StructField, StructType}

/**
 * Distributed exclusive prefix sum, per group — the shared machine under
 * `token_cap` (filter by budget) and grouped `pack_sequences` (stamp
 * sequence offsets). One range exchange on (group, order) keeps every
 * group's rows contiguous within and across partitions, which buys the
 * two properties everything here depends on:
 *
 *   1. the driver collect is ONE boundary tuple per partition —
 *      O(partitions) regardless of group cardinality, because only a
 *      partition's FIRST group can carry weight from earlier partitions
 *      (every other group in the partition starts at offset 0);
 *   2. the stamping pass needs only a (current group, running sum) pair —
 *      O(1) task memory, no per-group map.
 *
 * Weights must be integral so the running sums are exact long
 * arithmetic, bit-identical to the per-group SQL window restatement
 * regardless of partitioning. Null weights count 0. `groupCols` empty →
 * one global sum (the `shard` shape).
 *
 * Determinism requirement: the ranged RDD is evaluated by TWO jobs
 * (boundary collect, then stamping), and the chain arithmetic assumes
 * both see the same shuffle output. The input must therefore be
 * deterministic under recomputation — seeded samples, no round-robin
 * `repartition(n)` upstream (range partitioning on the full
 * (group, order) key is itself deterministic). Every engine entry point
 * feeding this operator (token_cap, pack_sequences, shard, assign_ids)
 * orders on a total key, so stage retry after executor loss re-derives
 * identical partitions.
 */
object GroupedPrefixSum {

  /** Group-key values must compare structurally across partition
    * boundaries. Raw `Row.get` hands back `Array[Byte]` for BinaryType
    * (reference equality — equal keys would silently restart the running
    * sum at a partition edge), so binary and nested values are converted
    * to structurally-comparable immutable forms once per row. Map keys
    * are rejected: Spark cannot range-partition on them anyway, and their
    * iteration order is undefined. */
  private def keyConv(dt: DataType): Any => Any = dt match {
    case BinaryType =>
      v => if (v == null) null
           else scala.collection.immutable.ArraySeq.unsafeWrapArray(v.asInstanceOf[Array[Byte]])
    // float/double keys compare via boxed-numeric equality where
    // NaN != NaN — every NaN-keyed row would restart the running sum
    // (fracturing the NaN group into per-row groups: token_cap budgets
    // silently bypassed, grouped pack offsets overlapping). Convert to
    // canonical bits: doubleToLongBits collapses every NaN to one
    // pattern, and -0.0 pre-normalizes to 0.0 — matching SQL's grouping
    // semantics (one NaN group; -0.0 groups with 0.0), which is also how
    // Spark range-partitions them (NaNs contiguous, zeros equal-sorted)
    case org.apache.spark.sql.types.DoubleType =>
      v => if (v == null) null else {
        val d = v.asInstanceOf[Double]
        java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      }
    case org.apache.spark.sql.types.FloatType =>
      v => if (v == null) null else {
        val f = v.asInstanceOf[Float]
        java.lang.Float.floatToIntBits(if (f == 0.0f) 0.0f else f)
      }
    case ArrayType(et, _) =>
      val ec = keyConv(et)
      v => if (v == null) null
           else v.asInstanceOf[scala.collection.Seq[Any]].iterator.map(ec).toVector
    case StructType(fields) =>
      val fcs = fields.map(f => keyConv(f.dataType))
      v => if (v == null) null
           else { val r = v.asInstanceOf[Row]; Vector.tabulate(r.length)(i => fcs(i)(r.get(i))) }
    case _: MapType => throw new IllegalArgumentException(
      "prefix sum: map-typed group columns are not supported (undefined ordering)")
    case _ => identity
  }

  /** Append `outCol` = exclusive per-group running sum of `weightCol`,
    * summing in `orderCols` order within each group. The returned frame
    * is range-partitioned and sorted on (groupCols, orderCols). */
  def stamp(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
            weightCol: String, outCol: String = "cum_before",
            numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    import org.apache.spark.sql.functions.col
    val schema = df.schema
    // resolve case-insensitively like Column resolution under the default
    // spark.sql.caseSensitive=false — the transforms' validate() accepts a
    // case-mismatched config, so runtime must too (exact match wins)
    def resolve(name: String): Int =
      schema.fields.indexWhere(_.name == name) match {
        case -1 =>
          schema.fields.zipWithIndex.filter(_._1.name.equalsIgnoreCase(name)) match {
            case Array((_, i)) => i
            case _ => schema.fieldIndex(name) // throws the descriptive error
          }
        case i => i
      }
    val wIdx = resolve(weightCol)
    val gIdxs = groupCols.map(resolve)
    schema.fields(wIdx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"prefix sum: weight column '$weightCol' must be integral for exact " +
          s"sums, got $other")
    }
    // build converters BEFORE the repartition so unsupported key types
    // fail with this operator's message, not Spark's ordering error
    val gConvs = gIdxs.map(i => keyConv(schema.fields(i).dataType))
    val rangeCols = groupCols.map(col) ++ orderCols
    val ranged = df.repartitionByRange(n, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    def weightOf(r: Row): Long =
      if (r.isNullAt(wIdx)) 0L
      else {
        val w = r.get(wIdx).asInstanceOf[Number].longValue()
        // a negative weight would silently shift every later row's
        // cum_before backwards — overlapping spans, over-budget groups
        if (w < 0) throw new IllegalArgumentException(
          s"prefix sum: weight column '$weightCol' has a negative value " +
            s"($w) — weights must be >= 0")
        w
      }
    def groupOf(r: Row): Seq[Any] =
      gIdxs.zip(gConvs).map { case (i, conv) => conv(r.get(i)) }

    val rdd = ranged.rdd
    rdd.setName(s"graft.prefixSum.ranged(${groupCols.mkString(",")})")
    // (pid, firstGroup, firstGroupSum, lastGroup, lastGroupSum) per
    // non-empty partition — the only cross-partition facts the chain needs
    val bounds: Array[(Int, Seq[Any], Long, Seq[Any], Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var firstG: Seq[Any] = null; var firstSum = 0L; var firstDone = false
          var curG: Seq[Any] = null; var curSum = 0L; var started = false
          it.foreach { r =>
            val g = groupOf(r)
            if (!started) { started = true; firstG = g; curG = g }
            else if (g != curG) {
              if (!firstDone) { firstSum = curSum; firstDone = true }
              curG = g; curSum = 0L
            }
            curSum += weightOf(r)
          }
          if (!firstDone) firstSum = curSum // single-group partition
          Iterator.single((pid, firstG, firstSum, curG, curSum))
        }
      }.collect()
    // chain boundary groups in partition order: a partition's first group
    // continues the running chain iff it IS the chain group; every other
    // group starts fresh at 0 (contiguity guarantees it has no earlier rows)
    val offsets = mutable.HashMap.empty[Int, Long]
    var chainG: Seq[Any] = null; var chainSet = false; var running = 0L
    bounds.sortBy(_._1).foreach { case (pid, fg, fs, lg, ls) =>
      val off = if (chainSet && fg == chainG) running else 0L
      offsets(pid) = off
      if (chainSet && fg == chainG && fg == lg) running = off + fs
      else { chainG = lg; chainSet = true; running = ls }
    }
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)

    val outSchema = StructType(schema.fields :+ StructField(outCol, LongType, nullable = false))
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val firstOff = bOffsets.value.getOrElse(pid, 0L)
      var curG: Seq[Any] = null; var cum = 0L; var started = false
      it.map { r =>
        val g = groupOf(r)
        if (!started) { started = true; curG = g; cum = firstOff }
        else if (g != curG) { curG = g; cum = 0L }
        val before = cum
        cum += weightOf(r)
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(stamped, outSchema)
  }
}
