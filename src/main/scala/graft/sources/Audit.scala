package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-audit sink (K10) — re-expression of the reference's
  * `VariantProcessingBase.insertSystemLogMessage:64-75`, which appends
  * one row per pipeline event to the SYSTEM_LOG table via an Oracle
  * sequence + SYSDATE.
  *
  * Spark-first shape: the audit row is a single-row DataFrame appended
  * to a log table path. The global sequence id is deliberately NOT
  * reproduced — at scale a shared sequence is a single point of
  * contention, and the (component, event_date) pair plus the sink's
  * own file identity already make rows distinguishable; a DB sink
  * would use an identity column (`Jdbc.stageForMerge` pattern).
  *
  * Deliberate deviation: the reference binds its two string args
  * SWAPPED — `su.update(new Object[]{msg, process})` against params
  * (SYSTEM_COMPONENT, STRING_VALUE), so in its output SYSTEM_COMPONENT
  * holds the message and STRING_VALUE the component. This sink
  * implements the evident intent (component -> system_component,
  * message -> string_value) and therefore does NOT byte-match the
  * reference's column placement.
  */
object Audit {

  /** Append one audit row. `floatValue` mirrors the reference's
    * always-0 FLOAT_VALUE slot, available for run metrics. */
  def logMessage(spark: SparkSession, path: String, component: String,
                 message: String, floatValue: Double = 0.0): Unit =
    spark.range(1).select(
      lit(component).as("system_component"),
      lit("Info").as("log_level"),
      current_timestamp().as("event_date"),
      lit(message).as("string_value"),
      lit(floatValue).as("float_value"))
      .write.mode("append").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
