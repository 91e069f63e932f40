package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.TransformConfig

/**
 * Training-sequence packing — the GPT-style "concatenate the corpus, then
 * cut every `seqLen` tokens" layout: documents are laid end-to-end in
 * `idColumn` order and each document is mapped to the fixed-length
 * training sequence(s) it lands in, with its token span inside the
 * document and its position inside the sequence. Unlike `chunk` (split
 * WITHIN a document) or `shard` (assign documents WHOLE to budgeted
 * groups), a packed sequence crosses document boundaries and a long
 * document crosses sequence boundaries — one output row per
 * (document, sequence) overlap:
 *
 *   - `seq_id`     — the sequence index, floor(offset / seqLen)
 *   - `tok_start` / `tok_end` — the [start, end) weight span of THIS
 *     document that falls in THIS sequence
 *   - `pos_in_seq` — where that span begins inside the sequence
 *
 * Exactly-N invariant: every sequence except the last receives exactly
 * `seqLen` units of weight across its rows.
 *
 * Scale shape: the offsets come from [[Shards.assignShards]]'s two-phase
 * distributed prefix sum (ONE range exchange + an O(partitions) driver
 * collect — never a SinglePartition window), and the span explode emits
 * at most `weight/seqLen + 1` rows per document. Weights must be
 * integral; the arithmetic is exact long arithmetic, bit-identical to
 * the SQL-window oracle regardless of partitioning. Zero/null-weight
 * documents occupy no span and are dropped.
 */
object PackSequences {

  def pack(df: DataFrame, idCol: String, weightCol: String, seqLen: Long,
           numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"pack_sequences: seqLen must be positive, got $seqLen")
    val stamped = Shards.assignShards(df, idCol, weightCol, seqLen, numPartitions)
      .drop("shard_id")
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .where(col("__w") > 0)
    stamped
      .withColumn("seq_id", explode(sequence(
        expr(s"cum_before div ${seqLen}L"),
        expr(s"(cum_before + __w - 1) div ${seqLen}L"))))
      .withColumn("tok_start", greatest(lit(0L), col("seq_id") * seqLen - col("cum_before")))
      .withColumn("tok_end", least(col("__w"), (col("seq_id") + 1) * seqLen - col("cum_before")))
      .withColumn("pos_in_seq", greatest(lit(0L), col("cum_before") - col("seq_id") * seqLen))
      .drop("__w", "cum_before")
  }
}

/**
 * `pack_sequences` — declarative wrapper over [[PackSequences.pack]].
 *
 * {{{
 * - name: pack
 *   type: pack_sequences
 *   options: {idColumn: doc_id, weightColumn: n_tokens, seqLen: "2048"}
 * }}}
 *
 * Options: `idColumn` (unique — it is the concatenation order),
 * `weightColumn` (integral), `seqLen` required; `numPartitions`
 * (default: session shuffle partitions).
 */
object PackSequencesTransform extends Transform {
  val transformType = "pack_sequences"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      Seq("idColumn", "weightColumn").flatMap(config.options.get), "pack_sequences")

  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "idColumn", "weightColumn", "seqLen")
    try PackSequences.pack(
      input,
      config.options("idColumn"),
      config.options("weightColumn"),
      config.options("seqLen").toLong,
      config.options.get("numPartitions").map(_.toInt).getOrElse(0))
    catch { case e: IllegalArgumentException => throw new ConfigException(e.getMessage) }
  }
}
