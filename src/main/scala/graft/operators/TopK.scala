package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded, mergeable top-k as a typed [[Aggregator]].
  *
  * Spark's own `row_number <= k` path is already good post-shuffle
  * (`WindowGroupLimit` caps each partition's sort), but every input row
  * still SHUFFLES to its group's reducer. This aggregator keeps at most
  * k (score, tag) pairs per group per map task, so the map-side partial
  * aggregation shrinks the shuffle from N rows to (groups x k x
  * mappers) — the difference that matters when N is 100 TB of
  * candidates and k is 10 (e.g. per-query ANN results, per-user top
  * events).
  *
  * Determinism: ordering is (score desc, tag asc) — ties cannot
  * reorder results across partitionings or retries.
  */
object TopK {

  /** Aggregator over (score, tag) pairs; buffer and result are the
    * descending top-k list. O(k) insert keeps buffers tiny and
    * serialization-cheap. */
  def topK(k: Int): Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] =
    new Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
      private def better(a: (Long, Long), b: (Long, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      override def zero: Seq[(Long, Long)] = Nil
      override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] = {
        // insert in order, trim to k — buf is always sorted descending
        val (pre, post) = buf.span(better(_, row))
        val merged = pre ++ (row +: post)
        if (merged.length > k) merged.take(k) else merged
      }
      override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var (i, j) = (0, 0)
        while (out.length < k && (i < a.length || j < b.length)) {
          if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
            out += a(i); i += 1
          } else { out += b(j); j += 1 }
        }
        out.toSeq
      }
      override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
      override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
      override def outputEncoder: Encoder[Seq[(Long, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    }
}
