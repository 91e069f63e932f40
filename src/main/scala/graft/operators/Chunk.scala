package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.{ExprUtils, TransformConfig}

/**
 * chunk — split documents into fixed-size character chunks with overlap:
 * the context-window packing step of a training-data pipeline (a 200 KB
 * document does not fit a training example; 500-char chunks with 50-char
 * overlap do).
 *
 * Chunk i covers `[i·stride, i·stride + size)` with `stride = size −
 * overlap`; the chunk count is `1` when `len ≤ size`, else
 * `⌈(len − size) / stride⌉ + 1` (integer arithmetic — exactly the SQL
 * `(len − size + stride − 1) div stride + 1`), so the final chunk always
 * reaches the end of the document and every character belongs to at least
 * one chunk. A null text yields no chunks (explode of a null sequence);
 * empty text yields one empty chunk.
 *
 * Scale shape: a pure per-row projection + explode — zero shuffle, stays
 * inside whole-stage codegen, and the output carries only (id, keep…,
 * chunk_id, chunk_text, chunk_len), never the original full text. Row
 * growth is corpus_chars / stride, the same as any chunker's output.
 *
 * {{{
 * - name: pack-contexts
 *   type: chunk
 *   options: {idColumn: doc_id, textColumn: text, size: "500",
 *             overlap: "50", keep: "lang"}
 * }}}
 */
object ChunkTransform extends Transform {
  val transformType = "chunk"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      (config.options.get("idColumn").toSeq ++ config.options.get("textColumn").toSeq ++
        config.options.get("keep").map(ExprUtils.parseColumns).getOrElse(Nil)), "chunk")
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "idColumn", "textColumn", "size")
    val id = config.options("idColumn")
    val text = config.options("textColumn")
    val size = config.options("size").toInt
    val overlap = config.options.get("overlap").map(_.toInt).getOrElse(0)
    if (size <= 0) throw new ConfigException(s"chunk size must be positive, got $size")
    if (overlap < 0 || overlap >= size)
      throw new ConfigException(s"chunk overlap must be in [0, size), got $overlap")
    val stride = size - overlap
    val keep = config.options.get("keep").map(ExprUtils.parseColumns).getOrElse(Nil)
    // the output/staging names are fixed: a kept column with one of them
    // would duplicate or ambiguate silently — fail with the guided error
    ExprUtils.requireNoHelperCollision("chunk", (id +: keep) :+ text,
      "chunk_id", "chunk_text", "chunk_len")

    val len = length(col(text))
    val nChunks = when(len <= size, lit(1L))
      .otherwise(expr(s"(length(`$text`) - $size + ${stride - 1}) div $stride") + 1L)
    input
      .select((id +: keep).map(col) :+ col(text) :+
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"): _*)
      .select((id +: keep).map(col) ++ Seq(
        col("chunk_id"),
        expr(s"substring(`$text`, cast(1 + chunk_id * $stride as int), $size)").as("chunk_text")): _*)
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
