package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward (inclusive) as-of join: each left row picks the single
  * right row with the greatest `rightTs <= leftTs` for the same keys —
  * the "most recent prior observation" join of event pipelines (the
  * reference has no such operator; Spark lacks it natively).
  *
  * Dataflow: tag both sides, union, and run one `last(_, ignoreNulls)`
  * window over (keys) ordered by (ts, side, tieBreak) — right rows
  * sort before left rows at equal ts, so the running "last right
  * payload" at a left row is exactly the as-of match. ONE shuffle on
  * the keys, no range join, no per-key loop; at 100 TB this is the
  * same partitioning story as any keyed window (skewed keys → salt the
  * key or split the window by coarse time buckets first).
  *
  * Determinism: if several right rows share (keys, rightTs), pass
  * `tieBreak` columns (right side) to make the winner explicit — or
  * pre-aggregate the right side to one row per (keys, ts).
  */
object AsofJoin {

  /** @param payload  right-side columns to attach to each left row
    *                 (null when no right row precedes the left row)
    * @param tieBreak right-side columns ordering equal-ts right rows
    *                 (last one wins)
    * @return all left columns plus `payload` columns */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload columns ${payload.intersect(leftCols)} clash with left side; alias them first")
    val rv = struct(payload.map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"), rv.as("__rv"),
          struct((tieBreak.map(col) :+ lit(0)): _*).as("__tb")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(rTagged.schema("__rv").dataType).as("__rv"),
          lit(null).cast(rTagged.schema("__tb").dataType).as("__tb")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
