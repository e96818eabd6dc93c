package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed building blocks for per-transcript CDS assembly.
  *
  * The catalog's q60 assembles CDS with
  * `sort_array(collect_list(struct(exon_idx, dna)))` — fine while a
  * transcript's exons fit comfortably in one aggregation buffer. This
  * typed [[Aggregator]] is the documented fallback (SURVEY §7.4.1) for
  * the same semantics with explicit, incremental buffer management:
  * partial aggregation runs map-side (chunks accumulate per partition
  * and merge associatively), and only `finish` materializes the
  * ordered concatenation.
  */
object CdsAssembly {

  /** One exon's DNA chunk within transcript `tid`. */
  case class ExonChunk(tid: Long, exon_idx: Int, dna: String)

  /** Order-insensitive accumulate, order-correct finish: concatenate
    * chunk strings by ascending index regardless of arrival order. */
  object OrderedConcat extends Aggregator[ExonChunk, List[(Int, String)], String] {
    override def zero: List[(Int, String)] = Nil
    override def reduce(b: List[(Int, String)], a: ExonChunk): List[(Int, String)] =
      (a.exon_idx, a.dna) :: b
    override def merge(b1: List[(Int, String)], b2: List[(Int, String)]): List[(Int, String)] =
      b1 ::: b2
    override def finish(b: List[(Int, String)]): String =
      b.sortBy(_._1).map(_._2).mkString
    override def bufferEncoder: Encoder[List[(Int, String)]] =
      ExpressionEncoder[List[(Int, String)]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
