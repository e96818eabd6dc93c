package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap rule opens sessions exactly where the gap is exceeded") {
    // user 1: gaps 5, 100 (new), 10, 200 (new)  -> sessions 1,1,2,2,3
    // user 2: single event                       -> session 1
    val rows = Seq(
      (1L, 0L), (1L, 5L), (1L, 105L), (1L, 115L), (1L, 315L),
      (2L, 1000L))
    val df = rows.zipWithIndex
      .map { case ((u, micros), i) => (u, micros, i.toLong) }
      .toDF("user_id", "m", "event_id")
      .withColumn("ts", timestamp_micros(col("m")))
    val got = Sessionize.withSessions(df, "user_id", "ts", gapMicros = 50L, Seq("event_id"))
      .select(col("user_id"), col("m"), col("session_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 1L && got((1L, 5L)) == 1L)
    assert(got((1L, 105L)) == 2L && got((1L, 115L)) == 2L)
    assert(got((1L, 315L)) == 3L)
    assert(got((2L, 1000L)) == 1L)
  }

  test("boundary: a gap of exactly gapMicros stays in the same session") {
    val df = Seq((1L, 0L, 0L), (1L, 50L, 1L)).toDF("user_id", "m", "event_id")
      .withColumn("ts", timestamp_micros(col("m")))
    val seqs = Sessionize.withSessions(df, "user_id", "ts", gapMicros = 50L, Seq("event_id"))
      .select(col("session_seq")).collect().map(_.getLong(0)).toSet
    assert(seqs == Set(1L))
  }
}
