package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming queries, oracle-checked.
  *
  * The reference is batch-only; its incremental idioms (append-mode
  * outputs, verify-before-insert loads — SURVEY §2.10) map to a file
  * streaming source + event-time windows + idempotent upserts
  * (`graft.streaming.StreamingOps`). Here the streaming path itself
  * joins the correctness gate: the stream is driven to completion with
  * `Trigger.AvailableNow` over the static test table, so the final
  * memory-sink contents must equal the batch aggregation that the
  * DuckDB oracle computes — same result through a genuinely different
  * (stateful, micro-batched) execution path.
  *
  * Scale note: the memory sink is gate plumbing only. On a cluster the
  * identical pipeline writes `writeStream.format("parquet")` (append
  * mode + watermark eviction) or `foreachBatch` into a keyed store; the
  * state store shuffles by (window, key) exactly like the batch
  * groupBy, so the 100 TB story is the partitioning story, unchanged.
  */
object QueriesStreaming {

  def all: Seq[Q] = Seq(

    // Tumbling 1-hour event-time windows with a 30-minute watermark,
    // executed by the streaming engine (AvailableNow → run-to-complete)
    // — the streaming twin of batch q14.
    Q("q17_stream_windowed",
      (spark, dir) => {
        // events.ts is TIMESTAMP(NANOS) parquet: read as long, convert
        // to a microsecond timestamp (mirrors queries.table()).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        // the file source wants a directory; select just the events
        // table out of the shared sf directory with a glob filter
        val raw = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        // type-adaptive like queries.table(): files written with real
        // micro/millisecond timestamps need no conversion
        val ev = schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
        val counts = graft.streaming.StreamingOps.windowedCounts(
          ev, "ts", "event_type", "1 hour", "30 minutes")
        val sink = "q17_stream_windowed_sink"
        val q = counts.writeStream.format("memory").queryName(sink)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(sink)
          .select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("w_start"),
            col("event_type"), col("cnt"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some(
        """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS w_start,
          |  event_type, count(*) AS cnt
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY 1, 2""".stripMargin)))
}
