package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{greatest, least}

/** Tuning constants of the MinHash/LSH/Jaccard dedup family, shared by
  * the gated queries (q41/q43/q52 in [[graft.queries.QueriesLlm]]) and
  * the stage profiler ([[graft.Prof]]) so a retune of the query can
  * never silently diverge from the workload the profiler measures.
  */
object DedupConfig {
  /** MinHash signature length. */
  val K = 16
  /** LSH bands. */
  val Bands = 4
  /** Signature rows per band. */
  val Rpb: Int = K / Bands
  /** Near-dup decision threshold: jaccard*1000 >= this. */
  val JaccThreshold = 700

  /** Size-ratio necessary condition for J >= JaccThreshold/1000:
    * J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs failing
    * 10*min >= 7*max cannot reach 0.700 — the filter only skips
    * intersections, never changes results. Keep the 7:10 literals in
    * sync with [[JaccThreshold]]. */
  def sizeRatioOk(sa: Column, sb: Column): Column =
    least(sa, sb) * 10 >= greatest(sa, sb) * 7
}
