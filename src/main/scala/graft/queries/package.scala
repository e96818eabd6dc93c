package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One catalog entry: Spark implementation + optional DuckDB oracle.
    * Column names/types must match between the two (the harness sorts
    * columns by name and hash-compares values). */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Read one test table (parquet) from the scale-factor directory.
    * `events.ts` is TIMESTAMP(NANOS) in the parquet, which Spark reads
    * only as a long (nanosAsLong); convert to a microsecond timestamp
    * (session TZ is UTC, matching DuckDB's naive rendering). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
