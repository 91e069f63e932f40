package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Parsing helpers for the compact expression dialects the reference uses:
 * `alias:expression` lists for map transforms and `alias:func(expr)` lists
 * for aggregations (pipelines/quickstart-1-sales-aggregation.yaml:17).
 *
 * The reference's naive `split(",")` (transformer/MapTransformer.scala:42)
 * breaks on nested commas like `concat(a, b)` or `sum(price * quantity)`;
 * this splitter is parenthesis- and quote-aware (SURVEY §7.4#3).
 */
object ExprUtils {

  /** Split on top-level commas only (ignores commas inside (), [] and quotes). */
  def splitTopLevel(s: String, sep: Char = ','): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote && (i == 0 || s.charAt(i - 1) != '\\')) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' | '['  => depth += 1; cur += c
        case ')' | ']'  => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    val last = cur.result()
    if (last.trim.nonEmpty || s.nonEmpty) out += last
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one `alias:expression` pair. The alias is everything before the
    * first ':' that is a valid identifier; otherwise the whole string is an
    * expression with no alias. */
  def parseAliased(item: String): (Option[String], String) = {
    val idx = item.indexOf(':')
    if (idx > 0) {
      val alias = item.substring(0, idx).trim
      val e = item.substring(idx + 1).trim
      if (alias.matches("[A-Za-z_][A-Za-z0-9_]*")) (Some(alias), e)
      else (None, item.trim)
    } else (None, item.trim)
  }

  /** `alias1:expr1,alias2:expr2` → columns (expr(e).as(alias)). */
  def parseExprList(spec: String): List[(String, String)] =
    splitTopLevel(spec).map { item =>
      val (alias, e) = parseAliased(item)
      (alias.getOrElse(e), e)
    }

  /**
   * Aggregation spec → Spark aggregate Columns.
   * Accepts both the compact form `alias:func(expr)` (incl. expression
   * aggregates like `revenue:sum(price * quantity)`) and the structured
   * triple `column|function|alias` used by dialect-B tests. The function
   * surface is the reference's 9 (sum avg count min max first last
   * collect_list collect_set; AggregationTransformer.scala:48-62) plus
   * supersets: count_distinct, approx_count_distinct, stddev, variance,
   * percentile_approx — all Spark built-ins, partial-aggregation friendly.
   */
  def parseAggregations(spec: String): List[Column] =
    splitTopLevel(spec).map { item =>
      val (aliasOpt, e) = parseAliased(item)
      val c = expr(e)
      aliasOpt.map(c.as).getOrElse(c)
    }

  /** Comma list of simple column names. */
  def parseColumns(spec: String): List[String] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toList

  /** The named column if its type is orderable, else its deterministic
    * JSON serialization — THE substitution every surface that sorts or
    * window-orders arbitrary user columns uses (quality-gate survivor
    * policy, SCD2 change detection, upsert pre-dedup tie-break), so a
    * MapType column degrades to a stable key instead of failing analysis. */
  def orderableOrJson(schema: org.apache.spark.sql.types.StructType,
                      name: String): Column = {
    // resolve case-insensitively like Column resolution does under the
    // default spark.sql.caseSensitive=false — a config naming "ID" against
    // a frame column "id" worked before this helper existed and must keep
    // working; an exact match wins when both casings exist
    val f = schema.fields.find(_.name == name).orElse {
      schema.fields.filter(_.name.equalsIgnoreCase(name)) match {
        case Array(only) => Some(only)
        case _ => None
      }
    }.getOrElse(schema(schema.fieldIndex(name))) // throws the descriptive error
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType)) col(name)
    else to_json(struct(col(name)))
  }

  /** A column name not present in `existing`: `base`, else `base_`,
    * `base__`, … — for operators that stage internal helper columns and
    * must not silently overwrite (then drop) a user column of the same
    * name. */
  def freshName(existing: Seq[String], base: String): String =
    Iterator.iterate(base)(_ + "_").dropWhile(existing.contains).next()

  /** Fail fast when an internal helper column name collides with user
    * data — the alternative is silent overwrite-then-drop data loss. For
    * operators whose helper names must stay FIXED (they cross private
    * function boundaries); operators that can rename use [[freshName]]. */
  def requireNoHelperCollision(op: String, columns: Seq[String],
                               helpers: String*): Unit = {
    val hit = helpers.filter(columns.contains)
    if (hit.nonEmpty) throw new graft.api.ConfigException(
      s"$op: input column(s) ${hit.mkString(", ")} collide with internal " +
        "helper names — rename them before this step")
  }

  /** One `orderBy` item: an expression with an optional trailing
    * asc/desc keyword — THE order-by parser for every ordered surface
    * (sort, dedup, window_rank, window_agg), hoisted so the dialect
    * cannot drift between them. */
  def parseOrder(item: String): Column = {
    val parts = item.trim.split("\\s+")
    if (parts.length > 1 && parts.last.equalsIgnoreCase("desc"))
      expr(parts.dropRight(1).mkString(" ")).desc
    else if (parts.length > 1 && parts.last.equalsIgnoreCase("asc"))
      expr(parts.dropRight(1).mkString(" ")).asc
    else expr(item.trim)
  }
}
