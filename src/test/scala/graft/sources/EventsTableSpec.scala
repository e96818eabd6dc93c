package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `queries.table("events")` must normalize `ts` to a session-TZ
  * TIMESTAMP regardless of the file's physical encoding — the driver's
  * testdata uses TIMESTAMP(NANOS) (read by Spark as long under
  * nanosAsLong), while standard writers (DuckDB COPY, Spark itself)
  * produce micro-second TIMESTAMP/TIMESTAMP_NTZ. The sf1 sweep caught
  * every events query failing on the NTZ encoding. */
class EventsTableSpec extends SparkSpec {

  private def dirWithEvents(write: String => Unit): String = {
    val d = Files.createTempDirectory("events_enc").toFile
    d.deleteOnExit()
    write(s"${d.getAbsolutePath}/events.parquet")
    d.getAbsolutePath
  }

  test("NTZ-encoded ts is cast to session timestamp, values preserved") {
    import spark.implicits._
    val dir = dirWithEvents { p =>
      Seq(("2024-03-01 10:30:00", 1L), ("2024-03-01 11:00:00", 2L))
        .toDF("s", "event_id")
        .select(col("s").cast(TimestampNTZType).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(p)
    }
    val df = graft.queries.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect().sorted
    assert(got === Array("2024-03-01 10:30:00", "2024-03-01 11:00:00"))
  }

  test("micro-second LTZ ts passes through unchanged") {
    import spark.implicits._
    val dir = dirWithEvents { p =>
      Seq(("2024-03-01 10:30:00", 1L)).toDF("s", "event_id")
        .select(col("s").cast(TimestampType).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(p)
    }
    val df = graft.queries.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) ===
      java.time.Instant.parse("2024-03-01T10:30:00Z").toEpochMilli * 1000L)
  }

  test("long ts (the driver's nanos encoding) converts via div 1000") {
    import spark.implicits._
    val micros = java.time.Instant.parse("2024-03-01T10:30:00Z")
      .toEpochMilli * 1000L
    val dir = dirWithEvents { p =>
      Seq((micros * 1000L, 1L)).toDF("ts", "event_id")
        .coalesce(1).write.parquet(p)
    }
    val df = graft.queries.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) === micros)
  }
}
