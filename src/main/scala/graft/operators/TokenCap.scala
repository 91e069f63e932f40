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
 *   2. a tiny job sums each (partition, group)'s weight — the collect is
 *      O(partitions + groups) because ranged partitions hold few groups.
 *   3. per-(partition, group) exclusive offsets broadcast; a
 *      per-partition running sum per group stamps and filters in one
 *      pass. No task ever holds more than its partition.
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

    // both jobs run over the SAME shuffled RDD: the partials collect
    // materializes the range exchange, the filter pass reuses its output
    val rdd = ranged.rdd
    rdd.setName(s"graft.tokenCap.ranged($groupCol)")
    val partials: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = mutable.LinkedHashMap.empty[Any, Long]
      it.foreach(r => sums.updateWith(groupOf(r))(p => Some(p.getOrElse(0L) + weightOf(r))))
      sums.iterator.map { case (g, s) => (pid, g, s) }
    }.collect()
    // exclusive offsets: for each group, weight in all EARLIER partitions
    val offsets = mutable.HashMap.empty[(Int, Any), Long]
    partials.groupBy(_._2).foreach { case (g, parts) =>
      var cum = 0L
      parts.sortBy(_._1).foreach { case (pid, _, s) => offsets((pid, g)) = cum; cum += s }
    }
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)
    def budgetOf(g: Any): Long =
      if (g == null) budget else overrides.getOrElse(String.valueOf(g), budget)

    val kept = rdd.mapPartitionsWithIndex { (pid, it) =>
      val cums = mutable.HashMap.empty[Any, Long]
      val offs = bOffsets.value
      it.filter { r =>
        val g = groupOf(r)
        val before = cums.getOrElse(g, offs.getOrElse((pid, g), 0L))
        cums(g) = before + weightOf(r)
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
