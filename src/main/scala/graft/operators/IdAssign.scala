package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic dense id assignment without a single global window.
  *
  * The reference allocates ids from an Oracle sequence one row at a
  * time (`managementDAO.createRgdId`, the one driver-side serialization
  * point in the load — SURVEY §7.4.3). A naive distributed replacement
  * is `row_number() over (order by key)` — deterministic, but a global
  * window funnels every row through one partition.
  *
  * Scale form (this object): range-partition by the key, number rows
  * *within* each partition in parallel, then add per-partition offsets
  * computed from the (tiny) partition row counts:
  *
  *   1. `repartitionByRange(key)` — ordered, disjoint key ranges;
  *   2. per-partition `row_number` over a window PARTITIONED by
  *      `spark_partition_id()` (parallel — no global shuffle to one
  *      reducer);
  *   3. partition counts (numPartitions rows) → running offsets via a
  *      window over that tiny frame → broadcast join back.
  *
  * Deterministic for a fixed partition count: range boundaries are
  * sampled but the final ordering (partition ranges + in-partition
  * sort) is total, so re-runs yield identical ids. Pass an explicit
  * `numPartitions` for cross-run stability.
  */
object IdAssign {

  /** Add `idCol` = offset + dense 1-based rank of each row under the
    * total order `keys`. Rows must be distinct on `keys`. */
  def assignDense(df: DataFrame, keys: Seq[String], idCol: String,
                  offset: Long = 0L, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // no sortWithinPartitions: the row_number window below already
    // sorts each partition by (__pid, keys) — a pre-sort would be paid
    // twice
    val ranged = df
      .repartitionByRange(parts, keys.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(keys.map(col): _*)
    // materialized once: offsets and the final join below both read
    // this frame, and RangePartitioner samples boundaries with a
    // per-RDD seed — two separate evaluations of the range shuffle can
    // land rows in different partitions, which would pair ranks from
    // one partitioning with offsets from another. A single
    // materialization makes the (pid, rn, offsets) triple consistent;
    // the *ids* are deterministic across runs regardless of boundary
    // placement because disjoint ordered ranges + in-partition sort is
    // the same total order however it is cut.
    val numbered = ranged.withColumn("__rn", row_number().over(wIn))
      .localCheckpoint(true)
    // per-partition offsets: prefix sums over the partition-count
    // frame (<= `parts` rows, a CONFIG-bounded size) via a broadcast
    // triangular join — no single-partition window anywhere in the
    // operator, so a WindowExec warning in a log always means a real
    // hazard
    val counts = numbered.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left_outer")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    numbered.join(broadcast(offsets), "__pid")
      .withColumn(idCol, lit(offset) + col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
