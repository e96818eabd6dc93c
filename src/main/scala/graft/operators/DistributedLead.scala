package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global `lead(ord)` WITHOUT a single-partition window.
  *
  * `Window.orderBy(ord)` with no partitioning is exact but serializes
  * the frame through one task — fine on a metadata-sized frame, a real
  * hazard once the frame grows (wig declarations and FASTA headers
  * scale with file count), and noisy either way (WindowExec warns per
  * instantiation, burying real single-partition hazards in the log).
  * This is the distributed form, same shape as [[IdAssign]]'s
  * two-level id assignment:
  *
  *  1. range-repartition by `ord` — disjoint ordered ranges, so the
  *     global successor of a row is either in its own partition or is
  *     the minimum of a LATER partition;
  *  2. per-partition `lead` over a PARTITIONED window (no warning, no
  *     single-task sort of the whole frame);
  *  3. each partition's boundary successor = min first-element of the
  *     later partitions — a partition-count-sized frame joined back
  *     broadcast. Empty range partitions simply contribute no row.
  *
  * The result is cut-invariant: ranges are disjoint and ordered, so
  * however the RangePartitioner places boundaries, every row's global
  * successor is the same. The input is materialized once
  * (localCheckpoint) because the per-row lead and the boundary frame
  * must observe the SAME partitioning (the sampler is seeded per-RDD;
  * two evaluations may cut differently — IdAssign's reasoning).
  *
  * `ord` must be unique and non-null (both call sites use dense line
  * ids). Output: the input columns plus `nextCol` (null for the
  * globally-last row).
  */
object DistributedLead {
  def withNext(df: DataFrame, ordCol: String, nextCol: String,
               numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(ordCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(ordCol))
    val firsts = ranged.groupBy(col("__pid")).agg(min(col(ordCol)).as("__first"))
    val bounds = firsts.as("a")
      .join(broadcast(firsts.as("b")), col("b.__pid") > col("a.__pid"), "left_outer")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(min(col("b.__first")).as("__boundary"))
    ranged
      .withColumn("__next", lead(col(ordCol), 1).over(wIn))
      .join(broadcast(bounds), Seq("__pid"), "left_outer")
      .withColumn(nextCol, coalesce(col("__next"), col("__boundary")))
      .drop("__pid", "__next", "__boundary")
  }
}
