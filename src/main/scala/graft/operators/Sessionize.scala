package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to
  * the same session while the inter-event gap stays within
  * `gapMicros`; a larger gap opens a new session. The training-data /
  * clickstream primitive the reference (strictly batch ETL) never
  * needed, expressed as two stacked windows — no state store, no
  * per-key loop:
  *
  *  1. `lag(ts)` marks session starts (gap exceeded or first event);
  *  2. a running sum of start flags numbers the sessions per key.
  *
  * ONE shuffle on the key; both windows share the same partitioning
  * and sort, so Catalyst plans a single Exchange + Sort. (The
  * streaming twin of this operator is
  * `session_window(col, gap)` in a watermarked groupBy.)
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, in time order). `tieBreak`
    * columns make the event order total when timestamps can repeat. */
  def withSessions(df: DataFrame, key: String, ts: String, gapMicros: Long,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(ts) +: tieBreak.map(col)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val micros = unix_micros(col(ts))
    val isStart = when(
      lag(micros, 1).over(w).isNull ||
        micros - lag(micros, 1).over(w) > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
