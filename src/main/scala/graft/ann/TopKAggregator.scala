package graft.ann

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregate. */
final case class ScoredCandidate(sim: Double, id: Long)

/** Bounded aggregation buffer: at most ~4k candidates between trims. */
final case class TopKBuffer(items: Seq[ScoredCandidate])

/**
 * Bounded-heap top-k aggregate for ANN ranking.
 *
 * Why not `row_number() OVER (PARTITION BY query_id)`: a window shuffles
 * EVERY scored row into |queries| reducer tasks and fully sorts each — with
 * few queries that is a handful of tasks each sorting the whole corpus, the
 * classic 100 TB scale-killer. As a typed Aggregator this compiles to an
 * ObjectHashAggregate with partial aggregation: each map task reduces its
 * partition to at most k candidates per query BEFORE the exchange, so the
 * shuffle carries |queries| × numPartitions × k rows instead of
 * |corpus| × |queries|.
 *
 * Determinism: ordering is (sim DESC, id ASC) — a total order because ids
 * are unique within a query — and trimming a buffer to its k best can never
 * drop a global top-k element (fewer than k elements beat it in any
 * subset). Result is independent of row arrival order, so oracle hash
 * checks (q28) are unaffected.
 */
final class TopKAggregator(k: Int) extends Aggregator[ScoredCandidate, TopKBuffer, TopKBuffer] {
  private val cap = math.max(4 * k, 64)

  private def better(a: ScoredCandidate, b: ScoredCandidate): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  private def best(items: Seq[ScoredCandidate], n: Int): Seq[ScoredCandidate] =
    items.sortWith(better).take(n)

  override def zero: TopKBuffer = TopKBuffer(Vector.empty)

  override def reduce(b: TopKBuffer, a: ScoredCandidate): TopKBuffer = {
    val appended = b.items :+ a
    TopKBuffer(if (appended.length > cap) best(appended, k) else appended)
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val combined = a.items ++ b.items
    TopKBuffer(if (combined.length > cap) best(combined, k) else combined)
  }

  override def finish(b: TopKBuffer): TopKBuffer = TopKBuffer(best(b.items, k))

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
}

/** One scored candidate with a non-integral (string) id. */
final case class ScoredCandidateStr(sim: Double, id: String)

/** Bounded buffer for the string-id variant. */
final case class TopKBufferStr(items: Seq[ScoredCandidateStr])

/**
 * String-id variant of [[TopKAggregator]] — gives arbitrary doc-id corpora
 * the same partial-aggregate (map-side bounded-heap) shape instead of the
 * single-task-per-query window fallback. Ordering is (sim DESC, id ASC);
 * id comparison is Java String order (UTF-16 code units), which matches
 * Spark's UTF8String binary order for all ASCII and BMP ids — the realistic
 * doc-id universe. Ids containing supplementary-plane characters may
 * tie-break differently from a window's ORDER BY only when sims are exactly
 * equal.
 */
final class TopKAggregatorStr(k: Int)
    extends Aggregator[ScoredCandidateStr, TopKBufferStr, TopKBufferStr] {
  private val cap = math.max(4 * k, 64)

  private def better(a: ScoredCandidateStr, b: ScoredCandidateStr): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  private def best(items: Seq[ScoredCandidateStr], n: Int): Seq[ScoredCandidateStr] =
    items.sortWith(better).take(n)

  override def zero: TopKBufferStr = TopKBufferStr(Vector.empty)

  override def reduce(b: TopKBufferStr, a: ScoredCandidateStr): TopKBufferStr = {
    val appended = b.items :+ a
    TopKBufferStr(if (appended.length > cap) best(appended, k) else appended)
  }

  override def merge(a: TopKBufferStr, b: TopKBufferStr): TopKBufferStr = {
    val combined = a.items ++ b.items
    TopKBufferStr(if (combined.length > cap) best(combined, k) else combined)
  }

  override def finish(b: TopKBufferStr): TopKBufferStr = TopKBufferStr(best(b.items, k))

  override def bufferEncoder: Encoder[TopKBufferStr] = Encoders.product[TopKBufferStr]
  override def outputEncoder: Encoder[TopKBufferStr] = Encoders.product[TopKBufferStr]
}
