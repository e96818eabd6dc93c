package graft

import org.apache.spark.sql.SparkSession

/** Engine-only scale runner: executes named catalog queries against a
  * data directory WITHOUT the DuckDB compare — the scale-evidence path
  * for queries whose ORACLE is infeasible at a given SF
  * (tools/sweep.py's QUADRATIC set: the engine completes at sf1, the
  * quadratic SQL replay doesn't). Emits ONE JSON line: per-query wall
  * seconds + result row count (a crashed query records err instead of
  * silently looking fast). Row counts make the evidence falsifiable —
  * a rerun at the same SF must reproduce them exactly, and a
  * candidate-explosion regression shows up as a count shift even
  * with no oracle in the loop.
  *
  * Usage: runMain graft.EngineRun <dataDir> <csv-of-name-substrings>
  */
object EngineRun {
  def main(args: Array[String]): Unit = {
    val Array(dataDir, namesCsv) = args
    val names = namesCsv.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // subset co-partitioning (public Spark conf, default true since
      // 3.3): a join keyed (bkey, grp) with both sides already
      // hash-partitioned on bkey must NOT re-shuffle the bucketed
      // store to the full key — the capped wave-vs-index join
      // (MinhashPipeline.verifiedDupPairsCapped) depends on this to
      // keep the band table exchange-free under its widened join key
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def clearBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    val sel = graft.queries.Catalog.all
      .filter(q => names.exists(q.name.contains))
    val cells = sel.map { q =>
      val t0 = System.nanoTime()
      val body =
        try {
          val rows = q.fn(spark, dataDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          f""""sec":$dt%.2f,"rows":$rows"""
        } catch { case e: Throwable =>
          val dt = (System.nanoTime() - t0) / 1e9
          val msg = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(120))
            .replaceAll("[\"\\\\\\n\\r\\t]", " ")
          f""""sec":$dt%.2f,"err":"$msg""""
        }
      clearBlocks()
      s""""${q.name}":{$body}"""
    }
    println(s"""{"metric":"engine_only","dir":"$dataDir",""" +
      s""""queries":${cells.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
