package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.TransformConfig

/**
 * Token-budget group caps — the absolute-volume counterpart to `mix`'s
 * rates: for every group (source, language, domain) keep documents in a
 * deterministic seeded order until the group's budget of weight (tokens,
 * chars, bytes) is reached, then stop. "Cap web crawl at 200 B tokens,
 * keep all of books/code" is exactly how production training mixtures
 * are drawn.
 *
 * Semantics are the SQL window
 *
 * {{{
 *   keep row ⇔ coalesce(sum(w) OVER (PARTITION BY g
 *                  ORDER BY md5(seed || ':' || id), id
 *                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
 *              < budget(g)
 * }}}
 *
 * — the document that CROSSES the budget boundary is kept (fill until
 * reached), and the md5 order makes the selection a reproducible uniform
 * draw: same seed + ids → same corpus on every run, retry, and engine.
 *
 * But that window funnels each group through ONE task (realistic strata
 * are few: sources, languages — 5 TB+ per task at corpus scale), so like
 * [[Shards]] the prefix sum runs distributed, generalized with the group
 * key:
 *
 *   1. `repartitionByRange(group, ord, id)` + sortWithinPartitions — one
 *      range exchange, the movement any per-group ordering costs; groups
 *      span contiguous partition runs.
 *   2. a tiny job collects ONE boundary tuple per partition (first/last
 *      group and their in-partition weights) — O(partitions) driver state
 *      REGARDLESS of group cardinality: contiguity means only a
 *      partition's FIRST group can carry weight from earlier partitions;
 *      every other group in the partition starts at offset 0. A
 *      billion-domain groupBy costs the driver the same per-partition
 *      tuple as a 3-source one;
 *   3. per-partition first-group offsets broadcast; a single sorted pass
 *      filters with one (current group, running sum) pair — O(1) task
 *      memory, no per-group map.
 *
 * Weights must be integral so the running sums are exact long arithmetic,
 * bit-identical to the SQL-window oracle regardless of partitioning.
 * Null weights count 0; a null group takes the default budget.
 */
object TokenCap {
  /**
   * @param budget     default per-group budget (weight units)
   * @param overrides  per-group budget overrides, keyed by the group
   *                   value's string form
   * @param groupCol   empty → one global budget over the whole corpus
   */
  def capByBudget(df: DataFrame, idCol: String, weightCol: String,
                  groupCol: String, budget: Long,
                  overrides: Map[String, Long] = Map.empty,
                  seed: Long = 0L, numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, s"token_cap: budget must be >= 0, got $budget")
    require(overrides.values.forall(_ >= 0), "token_cap: budgets must be >= 0")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"token_cap: weight column '$weightCol' must be integral for exact " +
          s"budget sums, got $other")
    }
    val grouped = groupCol.nonEmpty
    val ord = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val rangeCols =
      if (grouped) Seq(col(groupCol), col("__ord"), col(idCol))
      else Seq(col("__ord"), col(idCol))
    val ranged = df.withColumn("__ord", ord)
      .repartitionByRange(n, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    val schema = ranged.schema
    val wIdx = schema.fieldIndex(weightCol)
    val oIdx = schema.fieldIndex("__ord")
    val gIdx = if (grouped) schema.fieldIndex(groupCol) else -1
    def weightOf(r: Row): Long =
      if (r.isNullAt(wIdx)) 0L else r.get(wIdx).asInstanceOf[Number].longValue()
    def groupOf(r: Row): Any = if (grouped) r.get(gIdx) else null

    // both jobs run over the SAME shuffled RDD: the boundary collect
    // materializes the range exchange, the filter pass reuses its output.
    // Range partitioning on (group, ord, id) makes every group's rows
    // contiguous — within a partition and across the partition sequence —
    // which is what keeps the driver state at O(partitions).
    val rdd = ranged.rdd
    rdd.setName(s"graft.tokenCap.ranged($groupCol)")
    // (pid, firstGroup, firstGroupSum, lastGroup, lastGroupSum) per
    // non-empty partition — the only cross-partition facts the chain needs
    val bounds: Array[(Int, Any, Long, Any, Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var firstG: Any = null; var firstSum = 0L; var firstDone = false
          var curG: Any = null; var curSum = 0L; var started = false
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
    var chainG: Any = null; var chainSet = false; var running = 0L
    bounds.sortBy(_._1).foreach { case (pid, fg, fs, lg, ls) =>
      val off = if (chainSet && fg == chainG) running else 0L
      offsets(pid) = off
      if (chainSet && fg == chainG && fg == lg) running = off + fs
      else { chainG = lg; chainSet = true; running = ls }
    }
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)
    def budgetOf(g: Any): Long =
      if (g == null) budget else overrides.getOrElse(String.valueOf(g), budget)

    // groups are contiguous within the sorted partition, so one
    // (current group, running sum) pair replaces any per-group map
    val kept = rdd.mapPartitionsWithIndex { (pid, it) =>
      val firstOff = bOffsets.value.getOrElse(pid, 0L)
      var curG: Any = null; var cum = 0L; var started = false
      it.filter { r =>
        val g = groupOf(r)
        if (!started) { started = true; curG = g; cum = firstOff }
        else if (g != curG) { curG = g; cum = 0L }
        val before = cum
        cum += weightOf(r)
        before < budgetOf(g)
      }.map(r => Row.fromSeq(r.toSeq.patch(oIdx, Nil, 1)))
    }
    spark.createDataFrame(kept,
      org.apache.spark.sql.types.StructType(schema.fields.patch(oIdx, Nil, 1)))
  }
}

/**
 * `token_cap` — declarative wrapper over [[TokenCap.capByBudget]].
 *
 * {{{
 * - name: cap-sources
 *   type: token_cap
 *   options: {idColumn: doc_id, weightColumn: n_tokens, groupBy: source,
 *             budget: "200000000", budgets: "books:-, code:50000000"}
 * }}}
 *
 * Options: `idColumn`, `weightColumn`, `budget` required; `groupBy`
 * (absent → one global cap); `budgets` per-group overrides
 * (`group:budget,...`); `seed` (0); `numPartitions` (session shuffle
 * partitions).
 */
object TokenCapTransform extends Transform {
  val transformType = "token_cap"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      Seq("idColumn", "weightColumn", "groupBy").flatMap(config.options.get), "token_cap")

  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "idColumn", "weightColumn", "budget")
    val overrides = config.options.get("budgets").map { spec =>
      spec.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        p.split(":") match {
          case Array(g, b) if b.trim.nonEmpty =>
            // "-" = unlimited: keep the whole group (books/code in a
            // web-capped mixture)
            if (b.trim == "-") (g.trim, Long.MaxValue)
            else try (g.trim, b.trim.toLong)
            catch { case _: NumberFormatException => throw new ConfigException(
              s"token_cap: budget for '${g.trim}' must be a long or '-', got '${b.trim}'") }
          case _ => throw new ConfigException(
            s"token_cap: budgets must be group:budget,... got '$p'")
        }
      }.toMap
    }.getOrElse(Map.empty[String, Long])
    try TokenCap.capByBudget(
      input,
      config.options("idColumn"),
      config.options("weightColumn"),
      config.options.getOrElse("groupBy", ""),
      config.options("budget").toLong,
      overrides,
      config.options.get("seed").map(_.toLong).getOrElse(0L),
      config.options.get("numPartitions").map(_.toInt).getOrElse(0))
    catch { case e: IllegalArgumentException => throw new ConfigException(e.getMessage) }
  }
}
