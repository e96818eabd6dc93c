package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JDBC sink boundary (K2 batched append, K5 staging+MERGE) against
  * an embedded Derby database — hand-sized twin of the q105 gate, with
  * branch-level assertions the full-corpus hash can't localize. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.stream.error.file", s"$d/derby.log")
    s"$d/db"
  }
  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("append creates the table, MERGE updates matched and inserts unmatched") {
    Jdbc.shutdownEmbeddedDerby(dbDir)
    val url = s"jdbc:derby:$dbDir;create=true"
    val base = Seq(
      (1L, "A", "", 10),   // empty string must survive the round trip
      (2L, "C", "T", 20),
      (3L, "G", "A", 30)).toDF("id", "ref", "alt", "depth")
    Jdbc.append(base, url, "t", props, batchSize = 2, numPartitions = Some(2),
      columnTypes = Some("ref VARCHAR(4), alt VARCHAR(4)"))

    val delta = Seq(
      (2L, "C", "G", 220),  // matched -> UPDATE
      (9L, "T", "C", 90)    // not matched -> INSERT
    ).toDF("id", "ref", "alt", "depth")
    val merge = Jdbc.stageForMerge(delta, url, "t_stage", "t",
      keyCols = Seq("id"), setCols = Seq("ref", "alt", "depth"),
      props, columnTypes = Some("ref VARCHAR(4), alt VARCHAR(4)"))
    assert(Jdbc.execute(url, merge, props) == 2) // 1 update + 1 insert

    val back = spark.read.jdbc(url, "t", props)
      .select(col("id"), col("ref"), col("alt"), col("depth"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(back == Map(
      1L -> (("A", "", 10)),
      2L -> (("C", "G", 220)),
      3L -> (("G", "A", 30)),
      9L -> (("T", "C", 90))))

    // partition-per-predicate read covers every row exactly once
    val n = Jdbc.readPartitioned(spark, url, "t",
      Seq("MOD(\"id\", 2) = 0", "MOD(\"id\", 2) = 1"), props).count()
    assert(n == 4L)
    Jdbc.shutdownEmbeddedDerby(dbDir)
  }
}
